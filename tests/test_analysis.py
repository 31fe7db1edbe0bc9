"""Text-analysis operators: TF-IDF keyword extraction semantics."""

import math

import ray.data

from information_retrieval_images_ray.pipelines.analysis import tfidf_top_terms


def test_tfidf_top_terms_hand_computed():
    """3-doc corpus, hand-checkable: corpus-wide terms score ln(1)=0,
    rarer terms rank higher, tf multiplies, ties break term-asc."""
    docs = ray.data.from_items([
        {"doc_id": 0, "text": "apple apple banana common"},
        {"doc_id": 1, "text": "banana cherry common"},
        {"doc_id": 2, "text": "cherry cherry cherry common"},
    ])
    out = tfidf_top_terms(docs, k=2).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    ln32 = math.log(3 / 2)
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    d0 = out[out["doc_id"] == 0]
    assert list(d0["term"]) == ["apple", "banana"]
    assert d0["tfidf_e6"].iloc[0] == int(2 * math.log(3) * 1e6 + 0.5)
    # doc 1: banana and cherry both tf=1 df=2 -> equal score, term asc
    d1 = out[out["doc_id"] == 1]
    assert list(d1["term"]) == ["banana", "cherry"]
    assert (d1["tfidf_e6"] == int(ln32 * 1e6 + 0.5)).all()
    # doc 2: cherry tf=3 beats common (ln(1)=0 exactly)
    d2 = out[out["doc_id"] == 2]
    assert list(d2["term"]) == ["cherry", "common"]
    assert d2["tfidf_e6"].iloc[1] == 0
    # k=2 everywhere, ranks dense
    assert out.groupby("doc_id")["rank"].apply(list).map(
        lambda r: r == [1, 2]).all()


def test_tfidf_empty_and_k_larger_than_vocab():
    docs = ray.data.from_items([
        {"doc_id": 0, "text": ""},
        {"doc_id": 1, "text": "only"},
    ])
    out = tfidf_top_terms(docs, k=5).to_pandas()
    assert set(out["doc_id"]) == {1}  # empty doc emits nothing
    assert list(out["term"]) == ["only"] and list(out["rank"]) == [1]
