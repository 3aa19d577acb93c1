"""Cross-process exclusive lock for the file-backed stand-ins' state files.

FileBroker's high-water marks and FileSubscription's ack/lease state are
check-then-act sequences (load -> Spark action -> save) around a JSON file;
without a lock, two concurrent publishers interleave and one side's update
is silently lost — desynchronizing offsets from what was actually written
(r7 VERDICT #4: "lock or fail-loudly").  This helper serializes the whole
critical section with an advisory `flock` on a sibling `.lock` file:

- blocks (rather than fails) so interleaved publishers SERIALIZE — each
  sees the marks the previous one saved, preserving offset monotonicity;
- `flock` conflicts across distinct fds, so it also excludes two threads
  of one process (each call opens its own fd);
- the lock may be held across a multi-second Spark action by design: the
  stand-ins are test/bench scaffolding where correctness of the shared
  state beats publish concurrency.

Local-FS only (like the stand-ins themselves — a real broker owns this
state server-side).  NFS flock semantics vary by mount; the stand-ins'
documented scope is a local working directory.
"""

from __future__ import annotations

import fcntl
import os
from contextlib import contextmanager


@contextmanager
def state_lock(state_path: str):
    """Exclusive advisory lock guarding `state_path` (any sibling scheme
    works — the lock file is `state_path + \".lock\"` and is never the
    data file itself, so atomic `os.replace` of the data stays safe)."""
    lock_path = state_path + ".lock"
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
