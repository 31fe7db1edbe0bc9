"""HTTP serving layer — the reference's user-facing entry point
(/root/reference/server.py:46-177: POST /search, GET /get-image,
POST /reset-db over FastAPI) re-expressed as a dependency-free stdlib
``http.server`` JSON API over the sharded actor pool:

  POST /search        {"query": str, "limit": int=10, "hydrate": bool=true,
                       "snippet": bool=false, "snippet_window": int=8}
                      -> ranked [{doc_id, rank, score, repo, path, ...}]
                      (reference's {md5, file_path, description,
                      distance} hit shape, server.py:150-175).
                      With ``snippet`` (needs the server started with
                      ``corpus_path=``) each hit also carries
                      {snippet, snip_start, n_match}: the best
                      fixed-window highlight — same semantics as the
                      q_snippets battery (max distinct query terms in
                      the window, ties leftmost), query terms wrapped
                      in <em></em>. Literal modes mark the query
                      terms; expansion modes (prefix/fuzzy/wildcard/
                      regex) mark their deterministic dictionary
                      expansions — exactly the terms that scored;
                      more_like_this/prf return hits without snippets
                      (their matched terms come from per-anchor
                      docterms reads the page doesn't carry).
  GET  /doc/<doc_id>  -> the doc's metadata row (GET /get-image
                      analogue: the stored artifact for one hit)
  GET  /stats         -> index stats (the --show-db verb over HTTP)
  POST /delete        {"doc_ids": [int, ...]} -> tombstone count
                      (reference delete_record, vector_db.py:54-58;
                      actors re-sync tombstones on the next /search)
  POST /extend        {"docs": [{"content": str, ...meta}, ...],
                       "skip_existing_content": bool=false}
                      -> {"added": n, "n_docs": total} (reference's
                      POST /label-images ingest, server.py:46-63:
                      push new content through the pipeline over HTTP;
                      delta_id is the content hash, so re-POSTing the
                      same payload is an idempotent no-op — the
                      md5-presence skip at request granularity)
  POST /reset         {"confirm": true} -> {"removed": dir} — delete
                      the whole index and retire the pool (reference
                      POST /reset-db, server.py:104-116, which calls a
                      nonexistent delete_entire_db — here it works and
                      is guarded exactly like the CLI's `reset --yes`:
                      without confirm it's a 400 no-op). Afterwards
                      /search//stats return 409 until a rebuilt index
                      is re-attached via POST /reload (or a restart).
  POST /reload        {} -> {"n_docs": n} — attach a (re)built index
                      from disk by swapping in a fresh actor pool.
  POST /knn           {"vector": [float, ...] | "text": str,
                       "limit": int=10,
                       "nprobe": int=4, "filter_col": str|null,
                       "filter_value": any, "hydrate": bool=true}
                      -> pure ANN ranking over the attached persisted
                      IVF index (the reference's search_by_embedding
                      endpoint, vector_db.py:93-103 / server.py:147).
                      The query vector comes from the client OR the
                      server embeds ``text`` itself (the reference's
                      search-time embed, server.py:135-140, re-done
                      with the deterministic hashed-n-gram embedder —
                      functions.embedder — at the index's dim).
                      Tombstone-aware like /hybrid; 409 when no vector
                      index is attached.
  POST /hybrid        {"query": str, "vector": [float, ...] |
                       "text": str, "limit": int=10, "n_each": int=20,
                       "nprobe": int=4, "hydrate": bool=true}
                      -> RRF fusion of the BM25 ranking for ``query``
                      and the ANN ranking for ``vector`` against the
                      persisted IVF index the server was started with
                      (``vector_index_dir=``; 409 when absent). With
                      ``text`` and no ``vector``/``query``, the one
                      string drives both sides — the full text-in
                      hybrid loop, server-embedded.

Design notes, deliberately NOT the reference's shape where the
reference got it wrong: the heavy state (index shards) lives in the
long-lived ShardedQueryService actor pool, constructed ONCE at server
start — the reference constructs its Milvus/SQLite/embedding clients
per request (server.py:135-146). The HTTP layer itself is a thin
threaded router: all scoring runs in the Ray actors, so one process
serves concurrent requests with scatter-gather parallelism. At
cluster scale N of these routers sit behind any TCP load balancer —
the routers are stateless (tokenize + merge only).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pandas as pd

from .query import hydrate_hits
from .serving import ShardedQueryService

# request-body keys /search and /msearch pass through to search()
_SEARCH_PARAM_KEYS = (
    "must", "should", "must_not", "max_edits", "prefix_len",
    "max_expansions", "window", "max_terms", "exclude_doc", "offset",
    "snippet", "snippet_window", "fb_docs", "fb_terms", "beta",
    "explain", "search_after", "collapse_field",
)


def _best_window_tokens(
    tokens: list[str], qterms: set[str], window: int,
) -> tuple[int, int] | None:
    """Token-domain mirror of ``positions.best_window_positions``
    (same contract, asserted equal in tests/test_http.py): the start
    maximizing DISTINCT query terms in ``[start, start+window-1]``,
    candidate starts = query-term occurrence positions, ties leftmost.
    Used by the serving layer where the hit's text is already in hand
    (one page, k docs) — the positions-sidecar path would re-read what
    the snippet render fetches anyway."""
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        if t in qterms:
            pos.setdefault(t, []).append(i)
    if not pos:
        return None
    starts = sorted({i for ps in pos.values() for i in ps})
    best_s, best_n = starts[0], -1
    for s in starts:
        n = sum(
            1 for ps in pos.values() if any(s <= p < s + window for p in ps)
        )
        if n > best_n:
            best_s, best_n = s, n
    return best_s, best_n


class IndexHTTPServer:
    """Threaded JSON API over one index. ``port=0`` binds an ephemeral
    port (tests); ``start()`` serves in a daemon thread, ``close()``
    stops the listener and kills the actor pool."""

    def __init__(self, index_dir: str, num_actors: int = 2, port: int = 0,
                 host: str = "127.0.0.1", vector_index_dir: str | None = None,
                 embedder=None, corpus_path: str | None = None):
        self.index_dir = index_dir
        self.num_actors = num_actors
        self.vector_index_dir = vector_index_dir
        # source corpus parquet (file or dir) with (doc_id, text) —
        # enables "snippet": true on /search; reads are doc_id-pruned
        # per page, never a scan. Docs ingested later over /extend are
        # not in this file, so their hits render without snippets.
        self.corpus_path = corpus_path
        self._ivf = None  # lazy IVFIndexReader over vector_index_dir
        # server-side query embedder (reference embeds query TEXT at
        # search time, server.py:135-140): any object with
        # .embed([str]) -> (1, dim); default = the engine's own
        # HashedNgramEmbedder at the attached index's dim, built
        # lazily on the first text query
        self.embedder = embedder
        self.service: ShardedQueryService | None = ShardedQueryService(
            index_dir, num_actors=num_actors
        )
        self._tomb_count = -1  # force tombstone sync on first search
        # ThreadingHTTPServer handles requests concurrently; the
        # tombstone re-sync swaps the shared actor pool, so it must be
        # serialized (two racing deletes+searches would otherwise both
        # shut the pool down and leak one replacement)
        self._lock = threading.Lock()
        # Serializes ingests against each other and against /reset
        # WITHOUT blocking searches: the extend's Ray delta job runs
        # under this lock only, and ``_lock`` is taken just for the
        # O(actors) pool swap at the end — the rolling-index-update
        # form. Lock order is always _extend_lock -> _lock.
        self._extend_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    if self.path in ("/", "/ui"):
                        # built-in search UI (the reference's frontend
                        # view layer, Search.tsx, as one self-contained
                        # page over the same POST /search contract)
                        from .frontend import INDEX_HTML

                        body = INDEX_HTML.encode()
                        self.send_response(200)
                        self.send_header("Content-Type",
                                         "text/html; charset=utf-8")
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)
                        return
                    if outer.service is None and self.path != "/stats":
                        self._json(409, {"error": "index was reset; rebuild and POST /reload"})
                        return
                    if self.path == "/stats":
                        import os

                        path = os.path.join(outer.index_dir, "stats.json")
                        if not os.path.exists(path):
                            self._json(404, {"error": "no index (reset or never built)"})
                            return
                        with open(path) as f:
                            self._json(200, json.load(f))
                    elif self.path.startswith("/doc/"):
                        doc_id = int(self.path.split("/doc/", 1)[1])
                        rows = outer._hydrate([doc_id])
                        if not rows:
                            self._json(404, {"error": f"doc {doc_id} not found"})
                        else:
                            self._json(200, rows[0])
                    else:
                        self._json(404, {"error": "unknown route"})
                except Exception as e:  # surface, don't crash the thread
                    self._json(500, {"error": str(e)})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if self.path == "/reset":
                        if not req.get("confirm") is True:
                            self._json(400, {"error": "refusing: pass {\"confirm\": true}"})
                        else:
                            self._json(200, outer.reset())
                        return
                    if self.path == "/reload":
                        self._json(200, outer.reload())
                        return
                    if outer.service is None:
                        self._json(409, {"error": "index was reset; rebuild and POST /reload"})
                        return
                    if self.path == "/search":
                        try:
                            self._json(200, outer.search(
                                req.get("query", ""),
                                int(req.get("limit", 10)),
                                bool(req.get("hydrate", True)),
                                lang=req.get("lang"),
                                mode=str(req.get("mode", "bm25")),
                                **{kk: req[kk] for kk in _SEARCH_PARAM_KEYS
                                   if kk in req},
                            ))
                        except ValueError as e:  # bad mode / bad param
                            self._json(400, {"error": str(e)})
                        except FileNotFoundError as e:  # no sidecar
                            self._json(409, {"error": str(e)})
                    elif self.path == "/msearch":
                        try:
                            self._json(200, {
                                "responses": outer.msearch(
                                    req.get("searches", []))
                            })
                        except ValueError as e:  # malformed batch
                            self._json(400, {"error": str(e)})
                    elif self.path == "/facets":
                        out = outer.facets(
                            req.get("query", ""),
                            req.get("cols", ["lang"]),
                            lang=req.get("lang"),
                        )
                        # optional numeric range facet over token
                        # length: "length_edges": [0, 8, 16, ...]
                        if req.get("length_edges"):
                            out["length"] = outer.length_facets(
                                req.get("query", ""),
                                [int(e) for e in req["length_edges"]],
                                lang=req.get("lang"),
                            )
                        self._json(200, out)
                    elif self.path == "/termvectors":
                        self._json(200, outer.termvectors(
                            [int(d) for d in req.get("doc_ids", [])]))
                    elif self.path == "/significant":
                        self._json(200, outer.significant(
                            req.get("query", ""),
                            int(req.get("limit", 10)),
                            int(req.get("sample_n", 50)),
                            lang=req.get("lang"),
                        ))
                    elif self.path == "/delete":
                        from .maintenance import delete_docs

                        n_del = delete_docs(outer.index_dir, req.get("doc_ids", []))
                        self._json(200, {"tombstoned": n_del})
                    elif self.path == "/extend":
                        self._json(200, outer.extend(
                            req.get("docs", []),
                            bool(req.get("skip_existing_content", False)),
                        ))
                    elif self.path == "/knn":
                        if outer.vector_index_dir is None:
                            self._json(409, {"error": "no vector index attached (vector_index_dir)"})
                            return
                        vec = req.get("vector")
                        txt = req.get("text")
                        if vec is None and isinstance(txt, str) and txt.strip():
                            vec = outer.embed_text(txt)
                        if not isinstance(vec, list) or not vec:
                            self._json(400, {"error": "need \"vector\" (non-empty list of floats) or \"text\" (str)"})
                            return
                        self._json(200, outer.knn(
                            vec,
                            k=int(req.get("limit", 10)),
                            nprobe=int(req.get("nprobe", 4)),
                            filter_col=req.get("filter_col"),
                            filter_value=req.get("filter_value"),
                            hydrate=bool(req.get("hydrate", True)),
                        ))
                    elif self.path == "/hybrid":
                        if outer.vector_index_dir is None:
                            self._json(409, {"error": "no vector index attached (vector_index_dir)"})
                            return
                        vec = req.get("vector")
                        txt = req.get("text")
                        if vec is None and isinstance(txt, str) and txt.strip():
                            vec = outer.embed_text(txt)
                        if not isinstance(vec, list) or not vec:
                            self._json(400, {"error": "need \"vector\" (non-empty list of floats) or \"text\" (str)"})
                            return
                        self._json(200, outer.hybrid(
                            # text-only hybrid: the same string drives
                            # BOTH the lexical and the vector side
                            req.get("query") or (txt if isinstance(txt, str) else ""),
                            vec,
                            k=int(req.get("limit", 10)),
                            n_each=int(req.get("n_each", 20)),
                            nprobe=int(req.get("nprobe", 4)),
                            hydrate=bool(req.get("hydrate", True)),
                        ))
                    else:
                        self._json(404, {"error": "unknown route"})
                except Exception as e:
                    self._json(500, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- core ops (also usable without HTTP) ---------------------------------
    def search(self, query: str, k: int = 10, hydrate: bool = True,
               lang: str | None = None, mode: str = "bm25",
               **params) -> list[dict]:
        """``lang`` restricts results to docs with that docmeta lang
        (query-time filter; global stats — see IndexReader.search_*).

        ``mode`` multiplexes the full sharded query surface over one
        route (the Lucene query-type dispatch): ``bm25`` (default
        ranked search), ``boolean`` (params ``must``/``should``/
        ``must_not``; ``query`` is ignored), ``prefix``, ``fuzzy``
        (params ``max_edits``, ``prefix_len``, ``max_expansions``),
        ``more_like_this`` (``query`` is the source doc's text; params
        ``max_terms``, ``exclude_doc``), ``phrase`` and ``proximity``
        (param ``window``; both need the positions sidecar — 409
        without it), and ``prf`` (pseudo-relevance-feedback expansion;
        params ``fb_docs``, ``fb_terms``, ``beta``). ``explain``: true
        (bm25 only) attaches a per-hit ``explanation`` list — the
        Lucene-style per-term BM25 breakdown whose contributions sum
        to the hit's score. Every mode runs the same
        two-phase df-exchange + scatter-gather protocol and is
        rank-identical to the serial reader."""
        with self._lock:
            self._sync_tombstones()
            svc = self.service
        doc_filter = ("lang", lang) if lang else None
        _exp_terms = None
        if mode in ("prefix", "fuzzy", "wildcard", "regex") \
                and params.get("snippet"):
            # snippet highlighting needs the expansion set anyway —
            # expand ONCE and OR-score the explicit terms (bitwise
            # equal to the mode's own call, which would re-run the
            # same per-actor dictionary expansion a second time)
            _exp_terms = svc.expansion_terms(
                mode, query,
                max_expansions=int(params.get("max_expansions", 64)),
                max_edits=int(params.get("max_edits", 1)),
                prefix_len=int(params.get("prefix_len", 1)),
            )
            hits = svc.topk_terms([{"qid": 0, "terms": _exp_terms}], k=k,
                                  doc_filter=doc_filter)
        elif mode == "bm25":
            after = params.get("search_after")
            if after:
                # cursor paging: [score, doc_id] of the last hit seen
                hits = svc.topk_after(
                    [{"qid": 0, "query": query,
                      "after": (float(after[0]), int(after[1]))}],
                    k=k, doc_filter=doc_filter)
            else:
                hits = svc.topk([{"qid": 0, "query": query}], k=k,
                                doc_filter=doc_filter,
                                offset=int(params.get("offset", 0)))
        elif mode == "boolean":
            hits = svc.topk_boolean([{
                "qid": 0,
                "must": str(params.get("must", "")),
                "should": str(params.get("should", "")),
                "must_not": str(params.get("must_not", "")),
            }], k=k, doc_filter=doc_filter)
        elif mode == "prefix":
            hits = svc.topk_prefix(
                [{"qid": 0, "prefix": query}], k=k,
                max_expansions=int(params.get("max_expansions", 64)),
                doc_filter=doc_filter,
            )
        elif mode == "fuzzy":
            hits = svc.topk_fuzzy(
                [{"qid": 0, "word": query}], k=k,
                max_edits=int(params.get("max_edits", 1)),
                prefix_len=int(params.get("prefix_len", 1)),
                max_expansions=int(params.get("max_expansions", 64)),
                doc_filter=doc_filter,
            )
        elif mode == "wildcard":
            hits = svc.topk_wildcard(
                [{"qid": 0, "pattern": query}], k=k,
                max_expansions=int(params.get("max_expansions", 64)),
                doc_filter=doc_filter,
            )
        elif mode == "synonym":
            hits = svc.topk_synonym([{"qid": 0, "query": query}], k=k,
                                    doc_filter=doc_filter)
        elif mode == "more_like_this":
            hits = svc.topk_more_like_this([{
                "qid": 0, "text": query,
                "exclude_doc": params.get("exclude_doc"),
            }], k=k, max_terms=int(params.get("max_terms", 8)),
                doc_filter=doc_filter)
        elif mode == "phrase":
            hits = svc.topk_phrase([{"qid": 0, "phrase": query}], k=k,
                                   doc_filter=doc_filter)
        elif mode == "proximity":
            hits = svc.topk_proximity([{
                "qid": 0, "terms": query,
                "window": int(params.get("window", 8)),
            }], k=k, doc_filter=doc_filter)
        elif mode == "span_near":
            hits = svc.topk_spannear([{
                "qid": 0, "terms": query,
                "window": int(params.get("window", 8)),
            }], k=k, doc_filter=doc_filter)
        elif mode == "prf":
            hits = svc.topk_prf(
                [{"qid": 0, "query": query}], k=k,
                fb_docs=int(params.get("fb_docs", 5)),
                fb_terms=int(params.get("fb_terms", 8)),
                beta=float(params.get("beta", 0.5)),
                doc_filter=doc_filter)
        elif mode == "regex":
            hits = svc.topk_regex(
                [{"qid": 0, "pattern": query}], k=k,
                max_expansions=int(params.get("max_expansions", 64)),
                doc_filter=doc_filter,
            )
        elif mode == "boosted":
            hits = svc.topk_boosted([{"qid": 0, "query": query}], k=k,
                                    doc_filter=doc_filter)
        elif mode == "collapse":
            hits = svc.topk_collapse(
                [{"qid": 0, "query": query}],
                field=str(params.get("collapse_field", "lang")),
                k=k, doc_filter=doc_filter,
            )
        else:
            raise ValueError(
                f"unknown mode {mode!r}: expected bm25|boolean|prefix|"
                "fuzzy|wildcard|regex|boosted|collapse|synonym|"
                "more_like_this|phrase|proximity|span_near|prf"
            )
        rows = [
            {"rank": h["rank"], "doc_id": int(h["doc_id"]), "score": h["score"],
             **({"group": h["group"], "group_n": h["group_n"]}
                if "group" in h else {})}
            for h in hits
        ]
        if params.get("explain") and rows:
            if mode != "bm25":
                raise ValueError(
                    "explain is only available for mode=bm25 (the "
                    "breakdown mirrors the literal ranked query)")
            # per-hit Lucene-style breakdown: one pool explain call for
            # the whole page, grouped back onto the hit rows
            by_doc: dict[int, list[dict]] = {}
            for e in svc.explain(query, [r["doc_id"] for r in rows]):
                by_doc.setdefault(e["doc_id"], []).append({
                    "term": e["term"], "tf": e["tf"], "df": e["df"],
                    "idf": e["idf"], "contribution": e["contribution"],
                })
            for r in rows:
                r["explanation"] = by_doc.get(r["doc_id"], [])
        if hydrate and rows:
            meta = {m["doc_id"]: m for m in self._hydrate([r["doc_id"] for r in rows])}
            for r in rows:
                for key, val in meta.get(r["doc_id"], {}).items():
                    if key not in r:
                        r[key] = val
        if params.get("snippet") and rows:
            self._attach_snippets(
                rows, mode, query, params,
                window=int(params.get("snippet_window", 8)),
                qterms=set(_exp_terms) if _exp_terms is not None else None,
            )
        return rows

    def msearch(self, searches: list[dict]) -> list:
        """Elasticsearch-style ``_msearch``: N search bodies in one
        POST, one response list per body (order preserved). Bodies are
        grouped by (mode, limit, lang, hydrate) and every group of the
        POOLABLE literal modes (bm25 / boolean / synonym / boosted —
        modes whose router entry points natively take query BATCHES)
        with two or more members rides ONE pooled call: the group
        shares a single df exchange and a single scatter-gather across
        the shard actors, and hydration is ONE doc-id-pruned read per
        group (the round-trip amortization that is the point of
        msearch). Results are bitwise identical to per-body dispatch
        because the df exchange is query-independent. Everything else
        — expansion/positional/paged/explain/snippet bodies, and
        singleton groups — falls back to per-body ``search`` with
        per-body error isolation (a bad mode in body 3 yields
        ``{"error": ...}`` at index 3, not a failed batch — the ES
        contract)."""
        if not isinstance(searches, list) or not searches:
            raise ValueError("msearch needs a non-empty 'searches' list")

        POOLABLE = ("bm25", "boolean", "synonym", "boosted")

        def group_key(s: dict):
            mode = str(s.get("mode", "bm25"))
            if (mode in POOLABLE and not s.get("search_after")
                    and not int(s.get("offset", 0))
                    and not s.get("explain") and not s.get("snippet")):
                return (mode, int(s.get("limit", 10)), s.get("lang"),
                        bool(s.get("hydrate", True)))
            return None

        groups: dict[tuple, list[int]] = {}
        for i, s in enumerate(searches):
            gk = group_key(s)
            if gk is not None:
                groups.setdefault(gk, []).append(i)

        out: list = [None] * len(searches)
        pooled: set[int] = set()
        with self._lock:
            self._sync_tombstones()
            svc = self.service
        for (mode, k, lang, hyd), ixs in groups.items():
            if len(ixs) < 2:
                continue  # singleton: per-body path below costs the same
            doc_filter = ("lang", lang) if lang else None
            try:
                if mode == "bm25":
                    hits = svc.topk(
                        [{"qid": i, "query": str(searches[i].get("query", ""))}
                         for i in ixs], k=k, doc_filter=doc_filter)
                elif mode == "boolean":
                    hits = svc.topk_boolean(
                        [{"qid": i,
                          "must": str(searches[i].get("must", "")),
                          "should": str(searches[i].get("should", "")),
                          "must_not": str(searches[i].get("must_not", ""))}
                         for i in ixs], k=k, doc_filter=doc_filter)
                elif mode == "synonym":
                    hits = svc.topk_synonym(
                        [{"qid": i, "query": str(searches[i].get("query", ""))}
                         for i in ixs], k=k, doc_filter=doc_filter)
                else:
                    hits = svc.topk_boosted(
                        [{"qid": i, "query": str(searches[i].get("query", ""))}
                         for i in ixs], k=k, doc_filter=doc_filter)
            except (ValueError, FileNotFoundError):
                continue  # leave the group to per-body error isolation
            per: dict[int, list[dict]] = {i: [] for i in ixs}
            for h in hits:
                per[int(h["qid"])].append({
                    "rank": h["rank"], "doc_id": int(h["doc_id"]),
                    "score": h["score"],
                })
            if hyd:
                all_ids = sorted(
                    {r["doc_id"] for rows in per.values() for r in rows})
                if all_ids:
                    meta = {m["doc_id"]: m for m in self._hydrate(all_ids)}
                    for rows in per.values():
                        for r in rows:
                            for key, val in meta.get(r["doc_id"], {}).items():
                                if key not in r:
                                    r[key] = val
            for i in ixs:
                out[i] = per[i]
                pooled.add(i)
        for i, s in enumerate(searches):
            if i in pooled:
                continue
            try:
                out[i] = self.search(
                    s.get("query", ""), int(s.get("limit", 10)),
                    bool(s.get("hydrate", True)), lang=s.get("lang"),
                    mode=str(s.get("mode", "bm25")),
                    **{kk: s[kk] for kk in _SEARCH_PARAM_KEYS if kk in s},
                )
            except (ValueError, FileNotFoundError) as e:
                out[i] = {"error": str(e)}
        return out

    def _snippet_terms(self, mode: str, query: str, params: dict) -> set[str]:
        """The matched-term set a highlighter can mark for this mode:
        the literal query terms for the literal modes, the router's
        deterministic dictionary-expansion set for the expansion modes
        (prefix/fuzzy/wildcard/regex — exactly the terms that scored).
        Empty only for more_like_this/prf, whose matched terms come
        from per-anchor docterms reads the page doesn't carry."""
        tok = self.service._tok
        if mode in ("bm25", "phrase", "proximity", "span_near", "collapse"):
            return set(tok(query))
        if mode == "boosted":
            from .query import parse_boosted_query

            return set(parse_boosted_query(query, tok))
        if mode == "boolean":
            return set(tok(str(params.get("must", "")))) | set(
                tok(str(params.get("should", "")))
            )
        if mode == "synonym":
            from .flagship import SYNONYMS

            toks = set(tok(query))
            return toks | {s for t in toks for s in SYNONYMS.get(t, ())}
        if mode in ("prefix", "fuzzy", "wildcard", "regex"):
            return set(self.service.expansion_terms(
                mode, query,
                max_expansions=int(params.get("max_expansions", 64)),
                max_edits=int(params.get("max_edits", 1)),
                prefix_len=int(params.get("prefix_len", 1)),
            ))
        return set()

    def _attach_snippets(self, rows: list[dict], mode: str, query: str,
                         params: dict, window: int = 8,
                         qterms: set | None = None) -> None:
        """Add {snippet, snip_start, n_match} to each hit in place —
        q_snippets semantics (best distinct-term window, leftmost tie),
        query terms wrapped in <em></em>. One doc_id-pruned read of the
        page's texts; hits without corpus text (e.g. /extend'd docs) or
        in expansion modes are left untouched."""
        if not self.corpus_path:
            raise ValueError(
                "snippet requested but the server has no corpus_path")
        if qterms is None:
            qterms = self._snippet_terms(mode, query, params)
        if not qterms:
            return
        import pyarrow.dataset as pads

        t = pads.dataset(self.corpus_path, format="parquet").to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin([r["doc_id"] for r in rows]),
        )
        texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        tok = self.service._tok
        for r in rows:
            text = texts.get(r["doc_id"])
            if text is None:
                continue
            tokens = tok(text)
            got = _best_window_tokens(tokens, qterms, window)
            if got is None:
                continue
            start, n_match = got
            r["snip_start"] = start
            r["n_match"] = n_match
            r["snippet"] = " ".join(
                f"<em>{w}</em>" if w in qterms else w
                for w in tokens[start:start + window]
            )

    def facets(self, query: str, cols: list[str],
               lang: str | None = None) -> dict:
        """Match-set facet counts over docmeta columns (POST /facets:
        {"query", "cols": ["lang", ...], "lang"?}) — the whole-result-
        set distribution next to the ranked page, via the sharded
        service's per-actor partial counts."""
        with self._lock:
            self._sync_tombstones()
            svc = self.service
        doc_filter = ("lang", lang) if lang else None
        return svc.facets(
            [{"qid": 0, "query": query}], list(cols), doc_filter)[0]

    def significant(self, query: str, k: int = 10, sample_n: int = 50,
                    lang: str | None = None) -> list[dict]:
        """Significant-terms aggregation (POST /significant): what the
        query's whole match set is ABOUT, via the sharded router's
        match-prefix scatter + pruned docterms read + df exchange."""
        with self._lock:
            self._sync_tombstones()
            svc = self.service
        doc_filter = ("lang", lang) if lang else None
        return svc.topk_significant(
            [{"qid": 0, "query": query}], k=k, sample_n=sample_n,
            doc_filter=doc_filter)

    def termvectors(self, doc_ids: list[int]) -> list[dict]:
        """Per-doc term vectors (POST /termvectors {"doc_ids": [...]},
        the Elasticsearch ``_termvectors`` analogue): the (term, tf)
        pairs come from one doc_id-pruned read of the docterms
        checkpoint on the router, the exact global df from the actor
        pool's df exchange — the same protocol every ranked mode
        uses."""
        import os

        import numpy as np
        import pyarrow.dataset as pads
        import ray

        with self._lock:
            self._sync_tombstones()
            svc = self.service
        if svc is None:
            raise FileNotFoundError("no index attached")
        ids = sorted({int(d) for d in doc_ids})
        dt_dir = os.path.join(self.index_dir, "docterms")
        tbl = pads.dataset(dt_dir, format="parquet").to_table(
            columns=["doc_id", "terms", "tfs"],
            filter=pads.field("doc_id").isin(ids),
        ) if ids else None
        per_doc: dict[int, dict[str, int]] = {}
        all_terms: set[str] = set()
        if tbl is not None:
            from .maintenance import is_tombstoned, load_tombstones

            tomb = load_tombstones(self.index_dir)
            for d, terms, tfs in zip(tbl["doc_id"].to_pylist(),
                                     tbl["terms"].to_pylist(),
                                     tbl["tfs"].to_pylist()):
                if len(tomb) and bool(is_tombstoned(
                        tomb, np.asarray([int(d)], dtype=np.int64))[0]):
                    continue
                m = per_doc.setdefault(int(d), {})
                for t, f in zip(terms, tfs):
                    m[t] = m.get(t, 0) + int(f)
                    all_terms.add(t)
        terms_sorted = sorted(all_terms)
        gdf: dict[str, int] = {}
        if terms_sorted:
            parts = ray.get([
                a.df_locals.remote(terms_sorted) for a in svc.actors
            ])
            for p in parts:
                for t, n in p.items():
                    gdf[t] = gdf.get(t, 0) + n
        out = []
        for d in sorted(per_doc):
            m = per_doc[d]
            for t in sorted(m):
                out.append({"doc_id": d, "term": t, "tf": m[t],
                            "df": int(gdf.get(t, 0))})
        return out

    def length_facets(self, query: str, edges: list[int],
                      lang: str | None = None) -> list[dict]:
        """Numeric range-facet counts of the match set's token lengths
        (POST /facets with "length_edges") via the sharded service's
        per-actor bucket partials."""
        with self._lock:
            self._sync_tombstones()
            svc = self.service
        doc_filter = ("lang", lang) if lang else None
        return svc.length_facets(
            [{"qid": 0, "query": query}], edges, doc_filter)[0]

    def _ivf_reader(self):
        """Lazily attach the persisted IVF index's cluster-actor pool
        (caller holds ``_lock``). Lives for the server's lifetime —
        cluster caches warm across requests."""
        if self._ivf is None:
            from .similarity import IVFIndexReader

            self._ivf = IVFIndexReader(self.vector_index_dir, num_actors=self.num_actors)
        return self._ivf

    def embed_text(self, text: str) -> list[float]:
        """Server-side query embedding (the reference's search-time
        text embed, server.py:135-140 -> embeddings.py:12-31): embed
        with the configured embedder, or default to the engine's own
        HashedNgramEmbedder at the attached IVF index's dim — matching
        an index built by similarity.embed_text_pipeline with default
        seed. Deterministic, so server-embedded text and a client
        embedding the same text rank identically."""
        if self.embedder is None:
            from ..functions.embedder import HashedNgramEmbedder
            from .similarity import _read_ivf_meta

            dim = int(_read_ivf_meta(self.vector_index_dir)["dim"])
            self.embedder = HashedNgramEmbedder(dim=dim)
        return self.embedder.embed([text])[0].tolist()

    def _vector_topk(self, ivf, vector, n: int, nprobe: int, tombs,
                     filter_col: str | None = None, filter_value=None) -> pd.DataFrame:
        """ANN top-n over LIVE docs — the one tombstone contract both
        /knn and /hybrid use: overfetch by a capped tombstone
        allowance, drop tombstoned ids, dense re-rank. If the capped
        fetch came back underfilled (more than the allowance of
        tombstones outranked the live docs), refetch ONCE with the
        full tombstone count so heavily-deleted neighborhoods still
        fill to n."""
        q = np.asarray(vector, np.float64)[None, :]
        for fetch in (n + min(len(tombs), 64), n + len(tombs)):
            vec = ivf.search(
                q, k=fetch, nprobe=nprobe,
                filter_col=filter_col, filter_value=filter_value,
            ).rename(columns={"vec_id": "doc_id"})
            if len(tombs):
                vec = vec[~vec["doc_id"].isin(list(tombs))]
            if len(vec) >= n or len(tombs) <= 64:
                break
        vec = vec.sort_values("rank").head(n).reset_index(drop=True)
        vec["rank"] = np.arange(1, len(vec) + 1, dtype=np.int64)
        return vec

    def knn(self, vector: list[float], k: int = 10, nprobe: int = 4,
            filter_col: str | None = None, filter_value=None,
            hydrate: bool = True) -> list[dict]:
        """Pure ANN top-k for a client-supplied query vector against
        the attached persisted IVF index (reference
        search_by_embedding, vector_db.py:93-103). Tombstone contract
        shared with /hybrid via ``_vector_topk``."""
        from .maintenance import load_tombstones

        if self.vector_index_dir is None:
            raise RuntimeError("no vector index attached (vector_index_dir)")
        with self._lock:
            ivf = self._ivf_reader()
        tombs = load_tombstones(self.index_dir)
        vec = self._vector_topk(ivf, vector, k, nprobe, tombs,
                                filter_col, filter_value)
        rows = [
            {
                "rank": int(r["rank"]),
                "doc_id": int(r["doc_id"]),
                "sim": r["sim_e6"] / 1_000_000,
            }
            for _, r in vec.iterrows()
        ]
        if hydrate and rows:
            meta = {m["doc_id"]: m for m in self._hydrate([r["doc_id"] for r in rows])}
            for r in rows:
                for key, val in meta.get(r["doc_id"], {}).items():
                    if key not in r:
                        r[key] = val
        return rows

    def hybrid(self, query: str, vector: list[float], k: int = 10,
               n_each: int = 20, nprobe: int = 4, hydrate: bool = True) -> list[dict]:
        """Reciprocal-rank fusion of the BM25 top-``n_each`` for
        ``query`` (sharded scorer pool, tombstone-aware) and the ANN
        top-``n_each`` for ``vector`` (persisted-IVF cluster actors).
        The vector side overfetches by the tombstone count and drops
        tombstoned ids with a dense re-rank, so both rankings range
        over live docs before fusing. Rows carry provenance
        (bm25_rank / vec_rank, null when only the other side hit)."""
        from .hybrid import rrf_fuse
        from .maintenance import load_tombstones

        if self.vector_index_dir is None:
            raise RuntimeError("no vector index attached (vector_index_dir)")
        with self._lock:
            self._sync_tombstones()
            svc = self.service
            ivf = self._ivf_reader()
        tombs = load_tombstones(self.index_dir)

        hits = svc.topk([{"qid": 0, "query": query}], k=n_each)
        lex = pd.DataFrame({
            "qid": np.zeros(len(hits), np.int64),
            "doc_id": np.array([h["doc_id"] for h in hits], np.int64),
            "rank": np.array([h["rank"] for h in hits], np.int64),
        })
        vec = self._vector_topk(ivf, vector, n_each, nprobe, tombs)

        fused = rrf_fuse(lex, vec, k=k)
        lex_rank = dict(zip(lex["doc_id"], lex["rank"]))
        vec_rank = dict(zip(vec["doc_id"], vec["rank"]))
        rows = [
            {
                "rank": int(r["rank"]),
                "doc_id": int(r["doc_id"]),
                "rrf": r["rrf_e6"] / 1_000_000,
                "bm25_rank": int(lex_rank[r["doc_id"]]) if r["doc_id"] in lex_rank else None,
                "vec_rank": int(vec_rank[r["doc_id"]]) if r["doc_id"] in vec_rank else None,
            }
            for _, r in fused.iterrows()
        ]
        if hydrate and rows:
            meta = {m["doc_id"]: m for m in self._hydrate([r["doc_id"] for r in rows])}
            for r in rows:
                for key, val in meta.get(r["doc_id"], {}).items():
                    if key not in r:
                        r[key] = val
        return rows

    def extend(self, docs: list[dict], skip_existing_content: bool = False) -> dict:
        """Append new docs over HTTP (reference POST /label-images):
        ids assigned after the current span, delta built through the
        normal ``extend_index`` path, then the actor pool is swapped
        for one that owns the new shards. ``delta_id`` is the content
        hash, so the same payload extends at most once. The Ray delta
        job runs under ``_extend_lock`` only — searches keep flowing
        against the CURRENT pool for its whole duration (they see the
        pre-extend index, exactly a rolling index update's semantics);
        ``_lock`` is taken just for the O(actors) swap at the end.
        Concurrent extends serialize on ``_extend_lock`` (both the
        doc-id span read and the delta build must not interleave)."""
        import hashlib
        import json as _json
        import os

        import ray.data

        from .build import extend_index

        if not docs:
            return {"added": 0, "error": "no docs"}
        with self._extend_lock:
            if self.service is None:  # reset raced in before us
                raise RuntimeError("index was reset; rebuild and POST /reload")
            with open(os.path.join(self.index_dir, "stats.json")) as f:
                before = _json.load(f)
            span = before["doc_id_span"]
            delta_id = hashlib.sha256(
                "\x00".join((d.get("content") or "") for d in docs).encode("utf-8")
            ).hexdigest()[:16]
            rows = [
                {
                    "doc_id": span + i,
                    "content": d.get("content") or "",
                    "repo": str(d.get("repo") or "http"),
                    "path": str(d.get("path") or f"http_{delta_id}_{i}.txt"),
                    "commit": str(d.get("commit") or ""),
                    "lang": str(d.get("lang") or ""),
                }
                for i, d in enumerate(docs)
            ]
            stats = extend_index(
                ray.data.from_items(rows),
                self.index_dir,
                delta_id=delta_id,
                skip_existing_content=skip_existing_content,
            )
            added = int(stats["n_docs"]) - int(before["n_docs"])
            if added:
                with self._lock:
                    num = max(1, len(self.service.actors))
                    # swap by DROPPING the old pool's handles (no
                    # ray.kill): a search mid-flight on the old pool
                    # holds its own reference, so its actors drain
                    # naturally and are GC-collected once the last
                    # in-flight call returns — killing them here turned
                    # concurrent searches into 500s
                    self.service = ShardedQueryService(self.index_dir, num_actors=num)
        return {"added": added, "n_docs": int(stats["n_docs"])}

    def _hydrate(self, doc_ids: list[int]) -> list[dict]:
        df = hydrate_hits(pd.DataFrame({"doc_id": doc_ids}), self.index_dir)
        out = []
        for _, row in df.iterrows():
            d = {}
            for key, val in row.items():
                if isinstance(val, (np.integer,)):
                    val = int(val)
                elif isinstance(val, (np.floating,)):
                    val = float(val)
                elif isinstance(val, bytes):
                    val = val.hex()
                elif val is not None and not isinstance(val, (str, int, float, bool)):
                    val = str(val)
                if isinstance(val, float) and val != val:  # NaN -> null
                    val = None
                d[key] = val
            # an unknown doc_id left-joins to all-null metadata
            if d.get("content_sha256") is not None:
                out.append(d)
        return out

    def _sync_tombstones(self) -> None:
        """Deletes issued while serving become visible on the next
        search: when the tombstone set grew, the actor pool is
        replaced (cheap at actor count; at scale this is a rolling
        restart or a tombstone broadcast). Caller holds ``_lock``.
        The old pool is not killed — its handles are dropped, so a
        search already mid-flight on it completes normally and the
        actors are GC-collected afterwards (a graceful rolling swap
        with no 500 window)."""
        from .maintenance import load_tombstones

        n = len(load_tombstones(self.index_dir))
        if n != self._tomb_count:
            if self._tomb_count >= 0:
                num = max(1, len(self.service.actors))
                self.service = ShardedQueryService(self.index_dir, num_actors=num)
            self._tomb_count = n

    def reset(self) -> dict:
        """Delete the index and retire the pool (reference POST
        /reset-db). Confirmation is enforced by the HTTP handler; the
        old pool's handles are dropped (in-flight searches drain).
        Takes ``_extend_lock`` first (the global lock order), so a
        reset waits for an in-flight ingest rather than deleting the
        index directory out from under its delta job."""
        import shutil

        with self._extend_lock, self._lock:
            self.service = None
            self._tomb_count = -1
            shutil.rmtree(self.index_dir, ignore_errors=True)
        return {"removed": self.index_dir}

    def reload(self) -> dict:
        """(Re-)attach the on-disk index with a fresh actor pool —
        used after an out-of-band rebuild following /reset."""
        import os

        with self._lock:
            if not os.path.exists(os.path.join(self.index_dir, "stats.json")):
                raise FileNotFoundError(f"{self.index_dir} has no built index")
            self.service = ShardedQueryService(
                self.index_dir, num_actors=self.num_actors
            )
            self._tomb_count = -1
        import json as _json

        with open(os.path.join(self.index_dir, "stats.json")) as f:
            return {"n_docs": int(_json.load(f)["n_docs"])}

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "IndexHTTPServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        if self.service is not None:
            self.service.shutdown()
        if self._ivf is not None:
            self._ivf.close()
