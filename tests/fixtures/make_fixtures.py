"""Freeze golden top-k fixtures (FIXTURES.md §2) from the brute-force
BM25 oracle over the seeded synthetic corpus. Run once; output is
committed. Regenerating with the same seed is byte-identical."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from information_retrieval_images_ray.corpus import generate_corpus
from information_retrieval_images_ray.functions.bm25 import bm25_brute_force
from information_retrieval_images_ray.functions.tokenizer import tokenize_code

N_DOCS = 300
SEED = 42

QUERIES = [
    {"qid": 1, "query": "varbyte"},                 # rare term
    {"qid": 2, "query": "get"},                     # hot stopword-like term
    {"qid": 3, "query": "query token merge"},       # multi-term
    {"qid": 4, "query": "getUserName"},             # camelCase compound
    {"qid": 5, "query": "read_buffer"},             # snake_case
    {"qid": 6, "query": "zzz_not_in_corpus"},       # no-hit
    {"qid": 7, "query": "sortBlock score heap"},
    {"qid": 8, "query": "salt shard codec"},
    {"qid": 9, "query": "user name index"},
    {"qid": 10, "query": "parse write stream delta posting"},
]

def main():
    tbl = generate_corpus(N_DOCS, SEED).to_pandas()
    tbl = tbl.sort_values(["repo", "path", "commit", "content"], kind="mergesort").reset_index(drop=True)
    docs_tokens = {i: tokenize_code(c) for i, c in enumerate(tbl["content"])}
    golden = {}
    for q in QUERIES:
        terms = sorted(set(tokenize_code(q["query"])))
        golden[str(q["qid"])] = [
            [d, s] for d, s in bm25_brute_force(docs_tokens, terms, k=10)
        ]
    here = os.path.dirname(__file__)
    with open(os.path.join(here, "queries.json"), "w") as f:
        json.dump({"n_docs": N_DOCS, "seed": SEED, "queries": QUERIES}, f, indent=1)
    with open(os.path.join(here, "golden_topk.json"), "w") as f:
        json.dump(golden, f, indent=1)
    print("frozen", len(QUERIES), "queries over", N_DOCS, "docs")

if __name__ == "__main__":
    main()
