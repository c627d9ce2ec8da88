"""Pinned semantics for the round-2 eval/tokenizer additions:
q_cohen_kappa, q_ndcg_eval, q_random_projection (oracle parity is the
harness's job; these pin the math from first principles) and
q_bpe_pair_stats (full Python recomputation of the three merges)."""

from __future__ import annotations

import math
from collections import Counter

from keycloak_event_stream_spark.llm.simsearch import _TOP_K, q_ndcg_eval
from keycloak_event_stream_spark.llm.tokenizer import q_bpe_pair_stats
from keycloak_event_stream_spark.llm.vectors import q_random_projection
from keycloak_event_stream_spark.operators.mleval import q_cohen_kappa
from tests.conftest import SF_DIR


def test_cohen_kappa_from_first_principles(spark):
    row = q_cohen_kappa(spark, SF_DIR).collect()[0]
    # recompute from the raw confusion counts the engine itself reports
    from keycloak_event_stream_spark.operators.mleval import (
        q_confusion_matrix,
    )

    cells = q_confusion_matrix(spark, SF_DIR).collect()
    n = sum(c["n"] for c in cells)
    agree = sum(c["n"] for c in cells if c["actual"] == c["predicted"])
    rowt: Counter = Counter()
    colt: Counter = Counter()
    for c in cells:
        rowt[c["actual"]] += c["n"]
        colt[c["predicted"]] += c["n"]
    pe_num = sum(
        rowt.get(k, 0) * colt.get(k, 0) for k in set(rowt) | set(colt)
    )
    assert row["n"] == n and row["agree"] == agree
    assert row["pe_num"] == pe_num
    expect = (n * agree - pe_num) / (n * n - pe_num)
    assert math.isclose(row["kappa"], expect, rel_tol=1e-12)
    assert -1.0 <= row["kappa"] <= 1.0


def test_ndcg_bounds_and_perfect_retrieval_sanity(spark):
    rows = q_ndcg_eval(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_retrieved"] <= _TOP_K
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-12
        assert r["dcg"] <= r["idcg"] + 1e-9
    # idcg is the same perfect-ranking constant for every query
    assert len({r["idcg"] for r in rows}) == 1


def test_random_projection_shape_and_distortion(spark):
    rows = q_random_projection(spark, SF_DIR).collect()
    assert len(rows) == 40
    for r in rows:
        assert r["vec_b"] == r["vec_a"] + 1
        assert r["d2_orig"] > 0 and r["d2_proj"] > 0
        assert math.isclose(
            r["ratio"], r["d2_proj"] / r["d2_orig"], rel_tol=1e-12
        )
    # JL with k=8 is noisy per-pair, but the distortion is unbiased:
    # the mean ratio over 40 pairs should sit in a broad band around 1
    mean_ratio = sum(r["ratio"] for r in rows) / len(rows)
    assert 0.4 < mean_ratio < 2.5


def _bpe_merges_python(texts: list[str], iters: int = 3):
    """Greedy BPE from first principles, mirroring the engine's
    sentinel representation exactly (merged symbols ARE the sentinel
    chars, including for the argmax tiebreak, which compares
    codepoints), expanded to readable pairs at the end."""
    from keycloak_event_stream_spark.llm.tokenizer import _S1, _S2

    sentinels = [_S1, _S2, "\ue002"]
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    out = []
    expand: dict[str, str] = {}
    for it in range(iters):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += n
        (best, cnt) = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        sent = sentinels[it]
        expand[sent] = best[0] + best[1]
        out.append((best[0], best[1], cnt))
        vocab = Counter(
            {w.replace(best[0] + best[1], sent): n for w, n in vocab.items()}
        )

    def readable(s: str) -> str:
        # later sentinels may contain earlier ones: expand in reverse
        for sent in reversed(sentinels[: len(expand)]):
            s = s.replace(sent, expand[sent])
        return s

    return [(readable(l), readable(r), c) for l, r, c in out]


def test_bpe_pair_stats_matches_first_principles(spark):
    rows = q_bpe_pair_stats(spark, SF_DIR).collect()
    assert [r["iter"] for r in rows] == [1, 2, 3]
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ]
    expect = _bpe_merges_python(texts)
    got = [(r["left_sym"], r["right_sym"], r["cnt"]) for r in rows]
    assert got == expect


def test_bpe_encode_compression_invariants(spark):
    from keycloak_event_stream_spark.llm.tokenizer import q_bpe_encode

    rows = q_bpe_encode(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # merges can only shorten the symbol sequence
        assert r["tokens_bpe"] <= r["tokens_char"]
        assert r["compression"] >= 1.0
        assert math.isclose(
            r["compression"], r["tokens_char"] / r["tokens_bpe"], rel_tol=1e-12
        )
