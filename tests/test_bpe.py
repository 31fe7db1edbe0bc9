"""BPE tokenizer training: merge determinism vs a naive reference
implementation, pair-count partition invariance, and encode
properties."""

from collections import Counter

import pytest
import ray.data

from information_retrieval_images_ray.functions.tokenizer import tokenize_simple
from information_retrieval_images_ray.pipelines.bpe import (
    bpe_pair_counts,
    encode_pipeline,
    encode_word,
    learn_bpe,
    word_counts,
)

TEXTS = [
    "lowest lower low lowly",
    "newest newer new newly lowest",
    "the lowest of the low",
    "",
]


def _ds(texts, parallelism=2):
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)],
        override_num_blocks=parallelism,
    )


def _naive_learn(texts, num_merges):
    """Independent reference: recount ALL pairs from scratch each
    round (no incremental update) straight from the raw texts."""
    wc = Counter(t for x in texts for t in tokenize_simple(x))
    syms = {w: list(w) for w in wc}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, s in syms.items():
            for p in zip(s, s[1:]):
                pairs[p] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


@pytest.mark.parametrize("parallelism", [1, 3])
def test_learn_bpe_matches_naive_reference(parallelism):
    want = _naive_learn(TEXTS, 12)
    got = learn_bpe(_ds(TEXTS, parallelism), 12)
    assert got == want
    # the corpus is dominated by 'low'/'est' stems: both must be learned
    joined = {a + b for a, b in got}
    assert "lo" in joined or "ow" in joined


def test_learn_bpe_exhausts_cleanly():
    # more merges than pairs exist: loop stops, no padding merges
    merges = learn_bpe(_ds(["ab ab", "ab"]), 50)
    assert merges == [("a", "b")]


@pytest.mark.parametrize("parallelism", [1, 3])
def test_pair_counts_partition_invariant(parallelism):
    out = bpe_pair_counts(_ds(TEXTS, parallelism)).to_pandas()
    got = dict(zip(out["pair"], out["n"]))
    want = Counter()
    for t in TEXTS:
        for w in tokenize_simple(t):
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    assert got == dict(want)


def test_encode_word_properties():
    merges = _naive_learn(TEXTS, 12)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ("lowest", "newest", "low", "x", "zzz"):
        pieces = encode_word(w, ranks)
        assert "".join(pieces) == w  # lossless
        assert len(pieces) <= len(w)
    assert encode_word("low", {}) == ["l", "o", "w"]  # no merges = chars


def test_encode_pipeline_compression_monotone():
    ds = _ds(TEXTS, 2)
    none = encode_pipeline(ds, []).to_pandas().set_index("doc_id")
    some = encode_pipeline(ds, learn_bpe(ds, 12)).to_pandas().set_index("doc_id")
    # zero merges: every char is a piece
    assert (none["n_bpe_pieces"] == none["n_chars"]).all()
    # learned merges never increase, and somewhere strictly shrink
    assert (some["n_bpe_pieces"] <= none["n_bpe_pieces"]).all()
    assert (some.loc[some["n_chars"] > 0, "n_bpe_pieces"]
            < none.loc[none["n_chars"] > 0, "n_bpe_pieces"]).any()


def test_word_counts_exact():
    out = word_counts(_ds(TEXTS, 3)).to_pandas()
    got = dict(zip(out["word"], out["n"]))
    assert got == dict(Counter(
        t for x in TEXTS for t in tokenize_simple(x)))
