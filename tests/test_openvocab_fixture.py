"""Pin the open-vocabulary fixture generator (tools/make_scale_data.py
--open-vocab) — the evidence in BENCH_LOCAL_openvocab.json is only as good
as the corpus's claimed properties: deterministic, Heaps-law vocabulary
growth, realistic head frequency, planted edit-distance-1 siblings."""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_scale_data import make_open_vocab


def _gen(tmp_path, n, name):
    out = str(tmp_path / name)
    make_open_vocab(out, n)
    return pq.read_table(os.path.join(out, "documents.parquet")).to_pandas()


def test_deterministic_and_planted_siblings(tmp_path):
    a = _gen(tmp_path, 300, "a")
    b = _gen(tmp_path, 300, "b")
    assert a.equals(b), "generator must be deterministic (no RNG state)"
    base = a[a.doc_id < 3000]
    sibs = a[a.doc_id >= 3000]
    # every 29th doc gets exactly one sibling: 'x' + original text (ed=1)
    assert len(sibs) == len(range(0, 300, 29))
    for _, s in sibs.iterrows():
        orig = base[base.doc_id == s.doc_id - 3000].iloc[0]
        assert s.text == "x" + orig.text


def test_heaps_growth_and_head_frequency(tmp_path):
    small = _gen(tmp_path, 200, "s")
    big = _gen(tmp_path, 2000, "l")

    def vocab_and_tokens(df, n):
        # siblings get doc_id = 10*n + i; measure Heaps growth on the base
        # docs only so the planted duplicated text doesn't skew the counts
        toks = [w for t in df[df.doc_id < 10 * n].text for w in t.split()]
        return set(toks), toks

    v_s, t_s = vocab_and_tokens(small, 200)
    v_l, t_l = vocab_and_tokens(big, 2000)
    # open vocabulary: 10x tokens must grow the vocab substantially
    # (Heaps beta ~0.5 -> ~3x) but stay far from closed (~1x) or fully
    # unique (~10x)
    growth = len(v_l) / len(v_s)
    assert 1.8 < growth < 8.0, f"vocab growth {growth:.2f} not Heaps-like"
    # realistic head: the most frequent word is a few percent of tokens,
    # not the >50% a naive unbounded-support Zipf draw produces (the
    # rejected first cut documented in the generator docstring)
    from collections import Counter

    top_share = Counter(t_l).most_common(1)[0][1] / len(t_l)
    assert 0.01 < top_share < 0.2, f"head word share {top_share:.2%}"
