"""The 100 TB discipline as a gate (see tools/scale_lint.py): no
row-at-a-time UDFs, no toPandas in the engine, every collect()/crossJoin
annotated with its boundedness argument at the site.  A new unannotated
site fails here, in the diff that introduces it."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import scale_lint


def test_engine_is_scale_clean():
    problems = scale_lint.lint()
    assert not problems, "\n".join(problems)
