"""The driver-window rotation policy as a checked invariant (r6 VERDICT #7).

The driver's per-round CORRECTNESS gate verifies only the FIRST 50 entries
of `__spark_entry__.queries()`.  The policy (NOTES_r6.md "Debt statement
for r7"): code-changed/new queries claim the head of the window
(`ROTATION_HEAD`), and every remaining slot must go to a query that has
never had a GREEN driver row — until that backlog is exhausted, at which
point slots are free.  These tests fail the build when a round's window
wastes slots on already-verified queries while never-checked debt exists
(the r4/r5 miss that let 63 queries accumulate without a driver row).

No Spark session needed — this is registry + JSON bookkeeping.
"""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _registry():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    return entrymod


def _green_ever():
    """Query names with at least one green driver row in any round's
    CORRECTNESS file (green = ran without error and nothing mismatched;
    rows-only records count — the driver records hash_match=None there)."""
    green = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            rounds = json.load(fh)
        for name, rec in rounds.items():
            if rec.get("err") is None and all(
                rec.get(k) is not False
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                green.add(name)
    return green


def test_rotation_head_is_declared_and_small():
    e = _registry()
    window = list(e.queries())[:WINDOW]
    assert len(e.ROTATION_HEAD) <= 15, (
        "ROTATION_HEAD is the code-changed/new head, not a parking lot"
    )
    missing = [q for q in e.ROTATION_HEAD if q not in window]
    assert not missing, f"ROTATION_HEAD entries outside the window: {missing}"


def _round_num(path):
    import re

    return int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))


def _correctness_paths():
    """CORRECTNESS files sorted by NUMERIC round — lexicographic sorting
    misorders at round 100 (r100 < r99; r8 ADVICE low)."""
    return sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), key=_round_num
    )


def _latest_checked_set():
    """Key set of the most recent round's CORRECTNESS file (empty if none)."""
    paths = _correctness_paths()
    if not paths:
        return set()
    with open(paths[-1]) as fh:
        return set(json.load(fh))


def _round_underway():
    """True once the CURRENT round has visibly started work: a NOTES file
    newer than the latest CORRECTNESS round exists.  Gates the sequencing
    exemption below so it EXPIRES (r8 ADVICE low: an exemption that never
    expires re-opens the r4/r5 stale-window gap — a new round could coast
    on last round's window forever)."""
    paths = _correctness_paths()
    if not paths:
        return False
    n = _round_num(paths[-1])
    return os.path.exists(os.path.join(REPO, f"NOTES_r{n + 1}.md"))


def test_window_prioritizes_never_green_queries():
    e = _registry()
    names = list(e.queries())
    window = names[:WINDOW]
    green = _green_ever()
    never = [q for q in names if q not in green]
    backlog_outside = [q for q in never if q not in window]
    # Sequencing exemption (r7 VERDICT #2): when the driver's LATEST
    # CORRECTNESS file lands, the queries it just checked become green and
    # would instantly red this invariant — before the builder can possibly
    # rotate.  A window that still EXACTLY matches the latest round's
    # checked set is therefore exempt: rotation is owed, not overdue.  The
    # exemption EXPIRES the moment the round visibly starts (NOTES for the
    # next round exists — _round_underway), and also vanishes when
    # ROTATION_HEAD changes or the window diverges from the checked set.
    if set(window) == _latest_checked_set() and not _round_underway():
        return
    # any slot spent on an already-green, non-head query while never-green
    # debt waits outside the window is a wasted slot — the exact failure
    # mode of rounds 4-5
    wasted = [q for q in window if q in green and q not in e.ROTATION_HEAD]
    if backlog_outside:
        assert not wasted, (
            f"window wastes {len(wasted)} slot(s) on already-green queries "
            f"({wasted[:5]}...) while {len(backlog_outside)} never-checked "
            f"queries wait outside: {backlog_outside[:5]}..."
        )


def test_every_query_has_an_oracle_or_is_known_rows_only():
    e = _registry()
    missing = [q for q in e.queries() if q not in e.oracle_sql()]
    assert missing == [], f"queries with no oracle entry: {missing}"


def test_registry_has_no_duplicate_keys():
    """Dict literals silently drop duplicate keys — a query duplicated in
    the registry source would vanish from the gate without an error, so
    check the SOURCE (ast), not the constructed dict (whose keys are
    unique by construction)."""
    import ast

    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    dupes = []
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.Dict):
            consts = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            seen = set()
            for k in consts:
                if k in seen:
                    dupes.append(k)
                seen.add(k)
    assert dupes == [], f"duplicate dict-literal keys in __spark_entry__: {dupes}"
    assert len(_registry().queries()) >= 235


def test_marker_comment_matches_window_size():
    """r8 ADVICE medium: the r8 window held 52 entries above the 'driver
    window ends here (50)' marker, so the driver silently skipped the last
    two (a4/a5) while the in-code comment claimed all were checked.  Pin
    the marker to the truth: exactly WINDOW dict keys must appear between
    `return {` and the marker comment in queries()' source."""
    import re

    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    fn_start = src.index("def queries()")
    marker = src.index("driver window ends here", fn_start)
    head = src[src.index("return {", fn_start) : marker]
    keys = re.findall(r'^\s+"([a-z0-9_]+)":', head, re.M)
    assert len(keys) == WINDOW, (
        f"{len(keys)} entries above the window marker, expected {WINDOW}: "
        f"the marker (and any claims based on it) lies about what the "
        f"driver checks"
    )
    # and the marker count must agree with the REAL window the driver uses
    e = _registry()
    assert keys == list(e.queries())[:WINDOW]
