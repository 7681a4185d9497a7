"""Round-5 advice regressions.

1. ``build_session`` must NOT bake the 8 MB test-corpus
   ``spark.sql.files.maxPartitionBytes`` into the LIBRARY default: a
   production caller on real many-file lake tables would silently get
   ~16x more scan tasks.  The tuned value is a harness choice
   (bench.py / conftest / scripts pass it explicitly); the library
   leaves Spark's 128 MB default alone.

The EXISTS shape-companion regression lives in
tests/test_sparql.py::test_exists_substitution_shape_builtins and the
compaction repair-ordering regression in
tests/test_operators.py::test_compact_triples_planned.
"""

from __future__ import annotations

import inspect


def test_build_session_leaves_split_size_to_spark():
    from pyrdfa3_spark.session import build_session

    sig = inspect.signature(build_session)
    assert "max_partition_bytes" in sig.parameters
    assert sig.parameters["max_partition_bytes"].default is None
    src = inspect.getsource(build_session)
    # the conf is only set when the caller (or the env override) asks
    assert 'if mpb is not None' in src
    assert '8 * 1024 * 1024' not in src and '8 << 20' not in src


def test_harnesses_pass_tuned_split_size():
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ("tests/conftest.py", "scripts/check_oracles.py"):
        with open(os.path.join(root, rel)) as fh:
            assert "max_partition_bytes=8 << 20" in fh.read(), rel
