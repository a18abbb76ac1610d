"""The driver's correctness gate records only the first 50 queries()
registrations; the 12 long-stable entries parked past that prefix
(round-5 reorder, __spark_entry__.py) would otherwise have NO automated
oracle check left. This pins them: the local stand-in for the driver
gate (tools/validate_entry.py — row count + column names + exact
values, double bit-patterns included) must stay green for the tail at
sf0.001 on every test run."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

# keep in sync with the tail of __spark_entry__.queries() — the test
# also fails if this list and the actual past-50 tail ever diverge
TAIL = [
    "dedup_strip_windows", "kg_doc_concepts", "kg_concept_nodes",
    "kg_degrees", "kg_semtypes", "kg_word_stats", "text_sample",
    "text_shuffle", "events_rollup", "events_sessionize",
    "kg_mentions_full", "kg_relations",
]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_gate_tail_queries_stay_oracle_green():
    sys.path.insert(0, REPO)
    try:
        import __spark_entry__ as entry

        actual_tail = list(entry.queries())[50:]
        assert actual_tail == TAIL, (
            "queries() tail changed — update TAIL and re-check which "
            "entries the driver gate no longer covers")
    finally:
        sys.path.remove(REPO)

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "validate_entry.py"),
         SF_DIR, *TAIL],
        cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        f"tail oracle gate failed:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-2000:]}")
