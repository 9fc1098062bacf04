"""Pin tools/make_hard_docs.py — the hard-mode dedup fixture generator.

HARD_LABEL_FIXPOINT_r15.json's 90,575-cluster exact adjudication (and
the two engine boundaries that corpus exposed) are only reproducible if
the generator stays byte-deterministic and schema-faithful; these tests
make a silent edit loud, the same way test_scale_rung_tools pins
make_sf1.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "make_hard_docs.py")


def _gen(out_dir: str, families: int = 60, members: int = 5) -> str:
    r = subprocess.run(
        [sys.executable, TOOL, out_dir, str(families), str(members)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    return os.path.join(out_dir, "documents.parquet")


def test_hard_docs_deterministic_and_schema(tmp_path):
    p1 = _gen(str(tmp_path / "a"))
    p2 = _gen(str(tmp_path / "b"))
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read(), "generator must be byte-deterministic"
    t = pq.read_table(p1)
    # must match the driver documents.parquet schema exactly — the
    # engine's fingerprint pipeline and the fixpoint tool's oracle CTE
    # both read these columns by name/type
    ref = pq.read_schema("/root/testdata/sf0.001/documents.parquet")
    assert t.schema.names == ref.names
    assert [str(f.type) for f in t.schema] == [str(f.type) for f in ref]
    assert t.num_rows == 60 * 5
    docs = t.to_pydict()
    assert docs["doc_id"] == list(range(300))
    assert all(len(txt) == n for txt, n in zip(docs["text"], docs["n_chars"]))
    # family structure: every member is its family base with at most 3
    # of 30 token positions replaced, so any two members of a family
    # differ in at most 6 positions
    for fam in range(0, 300, 5):
        members = [docs["text"][fam + m].split(" ") for m in range(5)]
        assert all(len(t) == 30 for t in members)
        for i in range(5):
            for j in range(i + 1, 5):
                assert sum(a != b for a, b in zip(members[i], members[j])) <= 6


def test_pool_scales_with_families():
    """Round-16 VERDICT task 5: the vocabulary pool must grow with the
    family count (fixed 200k pool -> ~30 base docs per token at 2M docs
    -> vocab-pool chaining -> giant component), while the 200k floor
    keeps every committed artifact (families <= 50k) byte-identical."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_hard_docs as m

    assert m.pool_size(60) == 200_000  # test corpora: floor
    assert m.pool_size(50_000) == 200_000  # r15 500k-doc run: unchanged
    assert m.pool_size(200_000) == 800_000  # 2M-doc run: ~7.5 reuse
    assert m.pool_size(2_000_000) == 8_000_000  # 20M-doc headroom
