"""Generator invariants for the scale-ladder data (tools/gen_testdata).

The ladder's credibility rests on the generator being deterministic
(byte-identical regeneration — SCALE_LADDER.json must be reproducible
from the committed code) and on the density knob actually varying
shingle-space cardinality (the dedup density probe's premise).
Pure numpy/pyarrow — no Spark session.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_testdata import VOCAB, gen  # noqa: E402

SF = 0.002  # ~3k lineitem rows — fast enough for every test run


def _gen(tmp_path, name, **kw):
    out = str(tmp_path / name)
    gen(SF, out, **kw)
    return out


def test_regeneration_is_byte_identical(tmp_path):
    a = _gen(tmp_path, "a")
    b = _gen(tmp_path, "b")
    files = sorted(os.listdir(a))
    assert files == sorted(os.listdir(b)) and "lineitem.parquet" in files
    for f in files:
        with open(os.path.join(a, f), "rb") as fa, open(
            os.path.join(b, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f

def test_default_vocab_unchanged_by_knobs(tmp_path):
    # vocab_n=31 must reproduce the pre-knob output exactly — the
    # committed SCALE_LADDER numbers came from that corpus
    a = _gen(tmp_path, "plain")
    b = _gen(tmp_path, "explicit", vocab_n=len(VOCAB))
    for f in ("documents.parquet", "lineitem.parquet"):
        with open(os.path.join(a, f), "rb") as fa, open(
            os.path.join(b, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f


def test_wide_vocab_raises_cardinality(tmp_path):
    out = _gen(tmp_path, "wide", vocab_n=5000, tables={"documents"})
    assert os.listdir(out) == ["documents.parquet"]  # tables filter
    t = pq.read_table(os.path.join(out, "documents.parquet"))
    words: set[str] = set()
    for s in t["text"]:
        words.update(s.as_py().split())
    # 100 docs x ~50 words at sf0.002 — a 31-word vocab yields 31
    # distinct; a 5k vocab must yield thousands
    assert len(words) > 1500


def test_lineitem_linenumbers_are_dense_per_order(tmp_path):
    # the vectorized 1..k construction must match the per-order spec
    out = _gen(tmp_path, "li", tables={"lineitem"})
    t = pq.read_table(os.path.join(out, "lineitem.parquet"))
    ok = np.asarray(t["l_orderkey"])
    ln = np.asarray(t["l_linenumber"])
    # rows are written grouped by order, linenumber restarting at 1
    new_order = np.concatenate([[True], ok[1:] != ok[:-1]])
    assert (ln[new_order] == 1).all()
    assert (ln[~new_order] == ln[np.flatnonzero(~new_order) - 1] + 1).all()
