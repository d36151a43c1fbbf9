"""No doc quotes a bench number absent from a committed artifact.

Round-3 AND round-4 both shipped README/PARITY tables that diverged
from the committed ``BENCH_r0N.json``; the tables are now generated
from the newest artifact (tools/gen_perf_table.py) and this test fails
on any hand-edit or stale regeneration.
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _region(path):
    from tools.gen_perf_table import MARK_END, MARK_START
    text = path.read_text()
    m = re.search(re.escape(MARK_START) + r"\n(.*?)\n" + re.escape(MARK_END),
                  text, re.DOTALL)
    assert m, f"{path.name} is missing the generated bench-table markers"
    return m.group(1).strip()


def test_doc_tables_match_newest_artifact():
    from tools.gen_perf_table import render_table
    expected = render_table().strip()
    for doc in ("README.md", "PARITY.md"):
        got = _region(ROOT / doc)
        assert got == expected, (
            f"{doc}'s bench table does not match the newest committed "
            "artifact — run `python tools/gen_perf_table.py --write`")
