"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

The second classical subword trainer, complementing ``bpe.py``: BPE
grows a vocabulary bottom-up by merge counting; the unigram LM
(Kudo 2018) starts from an over-complete candidate vocabulary and
fits piece probabilities by EM over each word's segmentation
lattice, then keeps the most useful pieces. Spark shape mirrors the
BPE trainer's big insight — the corpus collapses to the DISTINCT
``(word, count)`` table ONCE (one combinable groupBy), and
everything afterwards is proportional to the vocabulary, not the
corpus:

- seeding: every substring (≤ ``seed_max_len`` chars) of every
  distinct word, weighted by corpus frequency — a scan-local HOF
  fan-out + ONE combinable count; top candidates by
  ``freq · (len − 1)`` (multi-char pieces must pay for themselves)
  plus ALL single characters (coverage guarantee: any word is
  segmentable).
- EM round: the candidate vocabulary is BOUNDED BY CONSTRUCTION
  (≤ seed_multiple · vocab_size entries), so it ships to executors
  as a broadcast closure; each Arrow batch of (word, count) rows
  runs the forward–backward lattice DP in numpy and emits per-piece
  EXPECTED COUNTS. Determinism discipline: expected counts are
  quantized to integer MICRO-COUNTS (×10⁶, the dsir micro-nat
  convention) before the combinable BIGINT sum — float partial sums
  would be partition-order-dependent; integers are not. New piece
  log-probs are micro-nat-quantized again, so every EM round is a
  pure function of the corpus.
- final vocabulary: top ``vocab_size`` pieces by expected count
  (all single chars always kept). This is the standard
  keep-the-useful-mass simplification of Kudo's
  loss-delta pruning — documented divergence, same fixed-point
  shape; the EXACT criterion needs per-piece leave-one-out
  likelihoods (another full EM per prune step).
- :func:`unigram_encode`: Viterbi segmentation per word, scan-local
  ``mapInPandas`` over the same broadcast vocabulary — the serving
  path is shuffle-free, like ``bpe_encode``.

No SQL oracle by design: the lattice DP is not expressible in
DuckDB SQL — this surface is pytest-verified (python-replica parity,
coverage, monotone likelihood, determinism), the documented
weaker-check class (like the streaming twins and codecs).

Reference: N/A (the reference repo has no tokenizer surface;
algorithm re-derived from the published unigram-LM description).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_indicators_etl_spark.llmdata.text import spread, words

#: micro-quantization scale shared by expected counts and log-probs.
_SCALE = 1_000_000.0


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, count) — the one corpus-sized reduction."""
    return (
        spread(docs)
        .select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _seed_candidates(
    word_table: DataFrame, seed_max_len: int, max_candidates: int
) -> list[tuple[str, int]]:
    """Frequent substrings as candidate pieces: scan-local substring
    fan-out over the DISTINCT word table, one combinable weighted
    count, deterministic top by (score desc, piece asc). Single
    characters are force-included (segmentation coverage)."""
    w = F.col("word")
    n = F.length(w)
    # all (start, len) substrings with len <= seed_max_len via one
    # sequence×sequence HOF fan-out — scan-local
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(seed_max_len), n - i + F.lit(1))
                ),
                lambda ln: F.substring(w, i, ln),
            ),
        )
    )
    scored = (
        word_table.select(F.explode(subs).alias("piece"), F.col("cnt"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("freq"))
    )
    chars = [
        (r["piece"], int(r["freq"]))
        for r in scored.filter(F.length("piece") == 1).collect()
    ]
    multi = (
        scored.filter(F.length("piece") > 1)
        .withColumn(
            "score", F.col("freq") * (F.length("piece") - F.lit(1))
        )
        .orderBy(F.col("score").desc(), F.col("piece").asc())
        .limit(max(max_candidates - len(chars), 0))
        .collect()
    )
    return chars + [(r["piece"], int(r["freq"])) for r in multi]


def _forward_backward(word: str, logp: dict, max_len: int) -> dict:
    """Expected piece counts for one word under the current unigram
    LM (forward–backward over the segmentation lattice, log domain).
    Returns {piece: expected_count} for pieces on viable paths."""
    n = len(word)
    neg = -1e30
    fwd = [neg] * (n + 1)
    fwd[0] = 0.0
    for j in range(1, n + 1):
        best = neg
        acc = None
        for i in range(max(0, j - max_len), j):
            p = logp.get(word[i:j])
            if p is None or fwd[i] <= neg / 2:
                continue
            v = fwd[i] + p
            acc = v if acc is None else max(acc, v) + math.log1p(
                math.exp(-abs(acc - v))
            )
        if acc is not None:
            fwd[j] = acc
    if fwd[n] <= neg / 2:
        return {}
    bwd = [neg] * (n + 1)
    bwd[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = None
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = logp.get(word[i:j])
            if p is None or bwd[j] <= neg / 2:
                continue
            v = bwd[j] + p
            acc = v if acc is None else max(acc, v) + math.log1p(
                math.exp(-abs(acc - v))
            )
        if acc is not None:
            bwd[i] = acc
    z = fwd[n]
    out: dict = {}
    for i in range(n):
        if fwd[i] <= neg / 2:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            p = logp.get(piece)
            if p is None or bwd[j] <= neg / 2:
                continue
            post = math.exp(fwd[i] + p + bwd[j] - z)
            if post > 1e-12:
                out[piece] = out.get(piece, 0.0) + post
    return out


def _viterbi(word: str, logp: dict, max_len: int) -> list[str]:
    """Best segmentation (ties → longer piece first, then lexicographic
    — deterministic)."""
    n = len(word)
    neg = -1e30
    best = [neg] * (n + 1)
    back = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            p = logp.get(piece)
            if p is None or best[i] <= neg / 2:
                continue
            v = best[i] + p
            if v > best[j] or (v == best[j] and back[j] is not None and i < back[j]):
                best[j] = v
                back[j] = i
    if back[n] is None and n > 0:
        return [word]  # unsegmentable (char missing) — emit whole word
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    return pieces[::-1]


def train_unigram_lm(
    docs: DataFrame,
    vocab_size: int = 64,
    n_rounds: int = 3,
    seed_max_len: int = 5,
    seed_multiple: int = 4,
    text_col: str = "text",
) -> pd.DataFrame:
    """Fit the unigram LM and return the final vocabulary as a
    pandas frame ``(piece, logp_unats, exp_count_micro)`` sorted by
    (expected count desc, piece asc). Deterministic: every
    distributed reduction is over micro-quantized BIGINTs."""
    wt = _word_table(docs, text_col).persist()
    try:
        cands = _seed_candidates(wt, seed_max_len, seed_multiple * vocab_size)
        total = sum(f for _, f in cands)
        logp = {
            p: math.floor(math.log(f / total) * _SCALE + 0.5) / _SCALE
            for p, f in cands
        }
        max_len = max(len(p) for p in logp)
        out_schema = T.StructType(
            [
                T.StructField("piece", T.StringType()),
                T.StructField("ec_micro", T.LongType()),
            ]
        )
        last_ec: dict = {}  # n_rounds=0 → seed vocab with zero counts
        for _ in range(n_rounds):
            cur = dict(logp)  # closure snapshot for this round

            def estep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for b in batches:
                    acc: dict = {}
                    for word, cnt in zip(b["word"], b["cnt"]):
                        for piece, e in _forward_backward(
                            str(word), cur, max_len
                        ).items():
                            acc[piece] = acc.get(piece, 0.0) + e * int(cnt)
                    yield pd.DataFrame(
                        {
                            "piece": list(acc),
                            "ec_micro": [
                                int(math.floor(v * _SCALE + 0.5))
                                for v in acc.values()
                            ],
                        },
                        columns=["piece", "ec_micro"],
                    )

            ec = (
                wt.mapInPandas(estep, schema=out_schema)
                .groupBy("piece")
                .agg(F.sum("ec_micro").alias("ec"))
                .filter(F.col("ec") > 0)
                .collect()
            )
            totals = sum(r["ec"] for r in ec)
            logp = {
                r["piece"]: math.floor(
                    math.log(r["ec"] / totals) * _SCALE + 0.5
                )
                / _SCALE
                for r in ec
            }
            # coverage: single chars may lose all mass to longer
            # pieces — pin them at floor probability so every word
            # stays segmentable
            floor_lp = math.floor(math.log(0.5 / max(totals, 1)) * _SCALE) / _SCALE
            for p, _f in cands:
                if len(p) == 1 and p not in logp:
                    logp[p] = floor_lp
            last_ec = {r["piece"]: int(r["ec"]) for r in ec}
        keep = sorted(
            logp,
            key=lambda p: (-(last_ec.get(p, 0)), p),
        )
        final = [p for p in keep if len(p) > 1]
        singles = [p for p in logp if len(p) == 1]
        # singles are never dropped (coverage); clamp the multi-char
        # budget at 0 so singles > vocab_size cannot flip the slice
        # negative and keep all-but-last-N pieces
        n_multi = max(vocab_size - len(singles), 0)
        vocab = sorted(set(final[:n_multi]) | set(singles))
        return pd.DataFrame(
            {
                "piece": vocab,
                "logp_unats": [int(logp[p] * _SCALE) for p in vocab],
                "ec_micro": [int(last_ec.get(p, 0)) for p in vocab],
            }
        ).sort_values(["ec_micro", "piece"], ascending=[False, True]).reset_index(
            drop=True
        )
    finally:
        wt.unpersist()


def unigram_encode(
    docs: DataFrame,
    vocab: pd.DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Viterbi-encode the corpus with a trained vocabulary: per doc
    the token list (space-joined) and token count. Scan-local
    ``mapInPandas`` with the bounded vocabulary in the closure —
    shuffle-free serving, the bpe_encode shape."""
    logp = {
        str(r["piece"]): int(r["logp_unats"]) / _SCALE
        for _, r in vocab.iterrows()
    }
    max_len = max(len(p) for p in logp)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("tokens", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for doc_id, ws in zip(b["doc_id"], b["_ws"]):
                toks: list[str] = []
                for word in [] if ws is None else ws:
                    if word:
                        toks += _viterbi(str(word), logp, max_len)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_tokens": len(toks),
                        "tokens": " ".join(toks),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_tokens", "tokens"])

    # Word-split Spark-side with the SHARED words() normalization
    # (ADVICE r11): the previous str(text).lower().split() diverged
    # from the trainer, _fertility_frame's word counts, and the DuckDB
    # oracles on Unicode whitespace (Python str.split splits on \xa0,
    # Java \s+ does not) and rendered null text as the literal word
    # 'none'. Feeding pre-split words keeps ONE tokenization
    # convention across train / serve / count / oracle.
    return (
        spread(docs)
        .select("doc_id", words(F.col(text_col)).alias("_ws"))
        .mapInPandas(run, schema=schema)
    )
