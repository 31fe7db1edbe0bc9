"""Relational operator shapes from SURVEY.md §2 over the driver's
TPC-H-ish tables — the reference's joins / anti-joins / aggregations /
top-k (J1-J4, G1-G7, T1-T2) expressed Ray-Data-first.

Patterns demonstrated (each is the scale-correct choice, not just the
convenient one):

- broadcast hash-join for small dimension sides (J4 hydration —
  reference does per-hit SQLite lookups, server.py:165);
- broadcast anti-/semi-joins via key sets (J1/J2/J3 — reference's
  ``md5 NOT IN (...)``, db.py:324-339);
- partial-aggregate combiner before groupby (G1/G2);
- sort-limit top-k (T1/T2);
- tumbling-window aggregate over the events stream table (§2.9 — the
  reference is strictly batch; windows via key+bucket groupby).

All fractional outputs use the fixed-point ``*_eN`` convention; money
sums use e2 (cents) because their magnitude makes e6 unstable under
float summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def e2_sum(x: np.ndarray) -> int:
    return int(np.floor(float(x) * 100 + 0.5))


def top_orders_hydrated(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k orders by totalprice, hydrated with customer + nation names
    via broadcast joins (T1 + J4). The tiny top-k key set drives
    pushdown-filtered dimension reads: only the k customers' rows ever
    leave storage (never a full-table ``to_pandas`` — at 10^9
    customers that table is the big side)."""
    top = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    custkeys = pa.array(sorted(set(top["o_custkey"].tolist())), pa.int64())
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
        .map_batches(
            lambda b: b.filter(pc.is_in(b["c_custkey"], value_set=custkeys)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out["o_totalprice_e2"] = [e2_sum(v) for v in out["o_totalprice"]]
    out = out[["o_orderkey", "o_totalprice_e2", "c_name", "n_name"]]
    return out.sort_values("o_orderkey").reset_index(drop=True)


def customers_without_big_orders(sf_dir: str, min_totalprice: float = 300_000.0) -> pd.DataFrame:
    """Anti-join (J2): customers with no order above a price threshold.
    The driving key set is collected via a distinct aggregate and
    broadcast into the filter — at scale this becomes a Bloom filter
    per the same pattern (reference's ``md5 NOT IN (...)``,
    db.py:324-339)."""
    have = pa.array(
        sorted(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .filter(expr=f"o_totalprice > {min_totalprice}")
            .unique("o_custkey")
        ),
        pa.int64(),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def anti(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch["c_custkey"], value_set=have)))

    out = cust.map_batches(anti, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype=str),
             "c_acctbal_e2": pd.Series(dtype="int64")}
        )
    out["c_acctbal_e2"] = [e2_sum(v) for v in out["c_acctbal"]]
    return (
        out[["c_custkey", "c_name", "c_acctbal_e2"]]
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


def building_segment_order_counts(sf_dir: str) -> pd.DataFrame:
    """Semi-join (J3) + grouped aggregate: per-customer order counts for
    the BUILDING market segment."""
    seg_keys = pa.array(
        sorted(
            _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
            .filter(expr="c_mktsegment == 'BUILDING'")
            .unique("c_custkey")
        ),
        pa.int64(),
    )
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def semi_partial(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.is_in(batch["o_custkey"], value_set=seg_keys))
        if kept.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        ks = kept["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(ks, return_counts=True)
        return pa.table({"o_custkey": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())})

    out = (
        orders.map_batches(semi_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="order_count"))
        .to_pandas()
    )
    return out.sort_values("o_custkey").reset_index(drop=True).astype("int64")


def revenue_by_flag_status(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped aggregate with a per-batch combiner (G1/G2):
    revenue = extendedprice * (1 - discount)."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.append_column("revenue", rev)
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("revenue", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_p", "sum_rev_p", "n_p"]
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_p", alias_name="sum_qty_f"),
            Sum("sum_rev_p", alias_name="sum_rev_f"),
            Sum("n_p", alias_name="n_rows"),
        )
        .to_pandas()
    )
    agg["sum_qty_e2"] = [e2_sum(v) for v in agg["sum_qty_f"]]
    agg["sum_revenue_e2"] = [e2_sum(v) for v in agg["sum_rev_f"]]
    out = agg[["l_returnflag", "l_linestatus", "sum_qty_e2", "sum_revenue_e2", "n_rows"]]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP shape (the warehouse subtotal report): the Q1
    aggregate at three levels — (flag, status), per-flag subtotals,
    and the grand total, NULL levels surfaced as 'ALL'. The rollup
    SUPERSUMS are computed over the leaf level's fixed-point INTEGER
    subtotals (not re-summed floats), so every level is order-exact
    and the SQL mirror (ROLLUP over a pre-aggregated CTE) matches
    bit-for-bit. One combiner exchange total — the leaf aggregate is
    ``revenue_by_flag_status``; the two upper levels are driver math
    over its handful of rows."""
    leaf = revenue_by_flag_status(sf_dir)
    cols = ["sum_qty_e2", "sum_revenue_e2", "n_rows"]
    by_flag = leaf.groupby("l_returnflag", as_index=False)[cols].sum()
    by_flag["l_linestatus"] = "ALL"
    total = leaf[cols].sum().to_frame().T
    total["l_returnflag"] = "ALL"
    total["l_linestatus"] = "ALL"
    out = pd.concat([leaf, by_flag, total], ignore_index=True)
    out = out[["l_returnflag", "l_linestatus"] + cols]
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def tumbling_window_events(sf_dir: str, window_s: int = 3600) -> pd.DataFrame:
    """Tumbling-window aggregate over the events table: per (user_id,
    window) event count + value sum. Window = floor(epoch/window_s)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())  # microseconds since epoch
        win = pc.divide(ts, pa.scalar(window_s * 1_000_000, pa.int64()))
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "win": win,
                "value": batch["value"],
            }
        )
        g = pa.TableGroupBy(t, ["user_id", "win"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(["user_id", "win", "sum_p", "n_p"])

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "win"])
        .aggregate(Sum("sum_p", alias_name="sum_f"), Sum("n_p", alias_name="n_events"))
        .to_pandas()
    )
    out["value_sum_e4"] = np.floor(out["sum_f"].to_numpy(np.float64) * 1e4 + 0.5).astype(np.int64)
    return (
        out[["user_id", "win", "n_events", "value_sum_e4"]]
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
        .astype({"user_id": "int64", "win": "int64", "n_events": "int64"})
    )


def distinct_langs(sf_dir: str) -> pd.DataFrame:
    """G7 distinct-key-set over documents (reference
    get_all_md5_hashes, vector_db.py:119-123)."""
    vals = sorted(_read(sf_dir, "documents", ["lang"]).unique("lang"))
    return pd.DataFrame({"lang": vals})


def grouped_topk_docs(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k: the ``k`` longest docs (token count) per lang,
    tie-break (n_tokens desc, doc_id asc) — the windowed-rank /
    QUALIFY shape (row_number() OVER (PARTITION BY ...) <= k).

    Scale shape: each batch emits only its own per-lang top-k (the
    combiner), so the exchange moves at most k x num_batches rows per
    lang — never the corpus; the final per-lang rank is a map_groups
    over those slivers."""
    from ..functions.tokenizer import get_tokenizer

    tok = get_tokenizer("simple")

    def partials(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.array(
            [len(tok(t or "")) for t in batch["text"].to_pylist()], np.int64
        )
        keep = np.zeros(len(ids), dtype=bool)
        by_lang: dict[str, list[int]] = {}
        for i, lang in enumerate(langs):
            by_lang.setdefault(lang, []).append(i)
        for idxs in by_lang.values():
            sub = np.asarray(idxs)
            order = np.lexsort((ids[sub], -n_tok[sub]))[:k]
            keep[sub[order]] = True
        return pa.table({
            "lang": pa.array([langs[i] for i in np.flatnonzero(keep)], pa.string()),
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(n_tok[keep], pa.int64()),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(np.int64)
        n = g["n_tokens"].to_numpy(np.int64)
        order = np.lexsort((ids, -n))[: min(k, len(ids))]
        return pd.DataFrame({
            "lang": g["lang"].iloc[0],
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            "doc_id": ids[order],
            "n_tokens": n[order],
        })

    out = (
        _read(sf_dir, "documents", ["doc_id", "lang", "text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.sort_values(["lang", "rank"]).reset_index(drop=True)
        .astype({"rank": "int64", "doc_id": "int64", "n_tokens": "int64"})
    )


Q3_CUTOFF_US = 896_659_200_000_000  # 1998-06-01 UTC in microseconds


def ship_priority_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 shape (shipping-priority top-k): revenue per
    not-yet-shipped order of BUILDING-segment customers — the classic
    3-table join + high-cardinality aggregate + top-k, composed from
    the scale-correct pieces:

    1. the SMALL side (BUILDING customer keys) broadcasts as a sorted
       key array (``ray.put`` once, searchsorted filter in-task);
    2. the BIG-x-BIG side (orders x lineitem) is a HASH JOIN expressed
       as the tagged-union + ``groupby(orderkey).map_groups`` pattern —
       lineitem first pre-aggregates revenue per orderkey in a
       per-batch Arrow combiner, so the join exchange moves one thin
       row per (orderkey, partial), never raw line items;
    3. the joined rows reduce to top-k with a per-batch top-k combiner
       (the max-merge property) before one driver-side merge of k-row
       fragments.

    Output: (l_orderkey, o_orderdate_us, o_orderpriority, revenue_e2)
    ordered by revenue desc, orderdate asc, orderkey asc. Ordering
    compares the FIXED-POINT integer on both sides, so ties are
    deterministic and SQL-identical.
    """
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
            .select(["c_custkey"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    ckeys_ref = ray.put(np.sort(cust["c_custkey"].to_numpy(np.int64)))

    def order_side(batch: pa.Table) -> pa.Table:
        ck = ray.get(ckeys_ref)
        dt = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
        keep = dt < Q3_CUTOFF_US
        idx = np.minimum(np.searchsorted(ck, oc), len(ck) - 1) if len(ck) else None
        keep &= ck[idx] == oc if len(ck) else False
        sub = batch.filter(pa.array(keep))
        return pa.table({
            "orderkey": sub["o_orderkey"],
            "date_us": sub["o_orderdate"].cast(pa.int64()),
            "priority": sub["o_orderpriority"],
            "rev_p": pa.nulls(sub.num_rows, pa.float64()),
            "side": pa.array(["o"] * sub.num_rows, pa.string()),
        })

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(sd > Q3_CUTOFF_US))
        rev = pc.multiply(
            sub["l_extendedprice"], pc.subtract(pa.scalar(1.0), sub["l_discount"])
        )
        g = pa.TableGroupBy(
            sub.select(["l_orderkey"]).append_column("rev", rev), ["l_orderkey"]
        ).aggregate([("rev", "sum")])
        n = g.num_rows
        return pa.table({
            "orderkey": g["l_orderkey"],
            "date_us": pa.nulls(n, pa.int64()),
            "priority": pa.nulls(n, pa.string()),
            "rev_p": g["rev_sum"],
            "side": pa.array(["l"] * n, pa.string()),
        })

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_side, batch_format="pyarrow")
    lines = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(line_side, batch_format="pyarrow")

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if o.empty or l.empty:
            # "string" dtype (not object) keeps Ray's block-size
            # estimator quiet on empty frames
            return pd.DataFrame({
                "l_orderkey": pd.Series(dtype="int64"),
                "o_orderdate_us": pd.Series(dtype="int64"),
                "o_orderpriority": pd.Series(dtype="string"),
                "revenue_e2": pd.Series(dtype="int64"),
            })
        return pd.DataFrame({
            "l_orderkey": [int(g["orderkey"].iloc[0])],
            "o_orderdate_us": [int(o["date_us"].iloc[0])],
            "o_orderpriority": [o["priority"].iloc[0]],
            "revenue_e2": [e2_sum(l["rev_p"].to_numpy(np.float64).sum())],
        })

    def topk_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["revenue_e2", "o_orderdate_us", "l_orderkey"],
            ascending=[False, True, True],
        )
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    out = (
        orders.union(lines)
        .groupby("orderkey")
        .map_groups(join_group, batch_format="pandas")
        .map_batches(topk_partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.sort_values(
        ["revenue_e2", "o_orderdate_us", "l_orderkey"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)
    return out.astype({"l_orderkey": "int64", "o_orderdate_us": "int64",
                       "revenue_e2": "int64"})


Q5_YEAR_LO_US = 852_076_800_000_000   # 1997-01-01 UTC in microseconds
Q5_YEAR_HI_US = 883_612_800_000_000   # 1998-01-01 UTC


def local_supplier_volume(sf_dir: str, region: str = "ASIA") -> pd.DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue per nation for
    line items where the CUSTOMER and the SUPPLIER share a nation in
    one region, over one order year — the 6-table join chain composed
    from the engine's scale-correct pieces:

    - region -> nation are dimension-tiny driver reads, reduced to a
      broadcast nationkey set + name map;
    - supplier broadcasts as parallel sorted arrays (suppkey ->
      nationkey), resolved in-task by searchsorted;
    - customer x orders is a tagged-union hash join on custkey —
      customer thins to (custkey, nationkey) for in-region customers,
      orders thins to (custkey, orderkey) after the date filter;
    - the result re-keys on orderkey for the second tagged-union join
      against lineitem, whose batch combiner pre-resolves the
      supplier's nation and PRE-AGGREGATES revenue per (orderkey,
      s_nationkey), so the big exchange moves one partial row per
      (order, supplier-nation), never raw line items;
    - the join group keeps only rows with c_nation == s_nation (the
      "local supplier" condition), and a final tiny nation aggregate
      emits (n_name, revenue_e2) sorted by revenue desc.
    """
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"].astype(int))
    nat = nat[nat["n_regionkey"].astype(int).isin(rkeys)]
    nkeys = np.sort(nat["n_nationkey"].to_numpy(np.int64))
    names = {int(k): v for k, v in zip(nat["n_nationkey"], nat["n_name"])}
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    broadcast_ref = ray.put((
        nkeys,
        sup["s_suppkey"].to_numpy(np.int64),
        sup["s_nationkey"].to_numpy(np.int64),
    ))

    def _isin_sorted(keys: np.ndarray, arr: np.ndarray) -> np.ndarray:
        if not len(keys):
            return np.zeros(len(arr), dtype=bool)
        idx = np.minimum(np.searchsorted(keys, arr), len(keys) - 1)
        return keys[idx] == arr

    # ---- stage 1: customer x orders on custkey --------------------------
    def cust_side(batch: pd.DataFrame) -> pd.DataFrame:
        nk, _, _ = ray.get(broadcast_ref)
        ck = batch["c_custkey"].to_numpy(np.int64)
        cn = batch["c_nationkey"].to_numpy(np.int64)
        keep = _isin_sorted(nk, cn)
        return pd.DataFrame({
            "key": ck[keep], "nationkey": cn[keep],
            "orderkey": np.full(int(keep.sum()), -1, np.int64),
        })

    def orders_side(batch: pd.DataFrame) -> pd.DataFrame:
        dt = batch["o_orderdate"].astype("int64").to_numpy()
        keep = (dt >= Q5_YEAR_LO_US) & (dt < Q5_YEAR_HI_US)
        return pd.DataFrame({
            "key": batch["o_custkey"].to_numpy(np.int64)[keep],
            "nationkey": np.full(int(keep.sum()), -1, np.int64),
            "orderkey": batch["o_orderkey"].to_numpy(np.int64)[keep],
        })

    def join_cust_orders(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["orderkey"] < 0]
        o = g[g["orderkey"] >= 0]
        if c.empty or o.empty:
            return pd.DataFrame({"orderkey": pd.Series(dtype="int64"),
                                 "c_nat": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "orderkey": o["orderkey"].to_numpy(np.int64),
            "c_nat": np.full(len(o), int(c["nationkey"].iloc[0]), np.int64),
        })

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_side, batch_format="pandas")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pandas")
    order_nat = (
        cust.union(orders).groupby("key")
        .map_groups(join_cust_orders, batch_format="pandas")
    )

    # ---- stage 2: x lineitem on orderkey --------------------------------
    def line_side(batch: pd.DataFrame) -> pd.DataFrame:
        _, sk, sn = ray.get(broadcast_ref)
        ok = batch["l_orderkey"].to_numpy(np.int64)
        sup_idx = np.minimum(np.searchsorted(sk, batch["l_suppkey"].to_numpy(np.int64)),
                             len(sk) - 1)
        s_nat = sn[sup_idx]
        rev = (batch["l_extendedprice"].to_numpy(np.float64)
               * (1.0 - batch["l_discount"].to_numpy(np.float64)))
        df = pd.DataFrame({"orderkey": ok, "s_nat": s_nat, "rev": rev})
        agg = df.groupby(["orderkey", "s_nat"], as_index=False)["rev"].sum()
        return pd.DataFrame({
            "orderkey": agg["orderkey"].astype("int64"),
            "nat": agg["s_nat"].astype("int64"),
            "rev_p": agg["rev"].astype("float64"),
        })

    def tag_order_nat(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "orderkey": batch["orderkey"].astype("int64"),
            "nat": batch["c_nat"].astype("int64"),
            "rev_p": np.full(len(batch), np.nan),  # customer-side marker
        })

    def join_order_lines(g: pd.DataFrame) -> pd.DataFrame:
        isc = g["rev_p"].isna()
        c = g[isc]
        l = g[~isc]
        if c.empty or l.empty:
            return pd.DataFrame({"nationkey": pd.Series(dtype="int64"),
                                 "rev_p": pd.Series(dtype="float64")})
        c_nat = int(c["nat"].iloc[0])
        local = l[l["nat"].to_numpy(np.int64) == c_nat]
        if local.empty:
            return pd.DataFrame({"nationkey": pd.Series(dtype="int64"),
                                 "rev_p": pd.Series(dtype="float64")})
        return pd.DataFrame({"nationkey": [c_nat],
                             "rev_p": [float(local["rev_p"].sum())]})

    lines = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pandas")
    per_nation = (
        order_nat.map_batches(tag_order_nat, batch_format="pandas")
        .union(lines)
        .groupby("orderkey")
        .map_groups(join_order_lines, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(Sum("rev_p", alias_name="rev_f"))
        .to_pandas()
    )
    per_nation["n_name"] = [names[int(k)] for k in per_nation["nationkey"]]
    per_nation["revenue_e2"] = [e2_sum(v) for v in per_nation["rev_f"]]
    out = per_nation[["n_name", "revenue_e2"]].sort_values(
        ["revenue_e2", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)
    return out.astype({"revenue_e2": "int64"})


# Frozen value-tier bands for the broadcast range join: [lo, hi) in
# integer cents, contiguous over [0, 2**62). Shared verbatim with the
# SQL VALUES list; rows outside every band (negative, or >= the last
# hi) match no tier on EITHER side — the engine enforces the hi bound
# explicitly so the boundary semantics stay bit-identical to the
# oracle's `cents < hi` predicate.
VALUE_TIERS = (
    ("t0_micro", 0, 1_000),          # < $10
    ("t1_small", 1_000, 5_000),      # $10-$50
    ("t2_mid", 5_000, 20_000),       # $50-$200
    ("t3_large", 20_000, 50_000),    # $200-$500
    ("t4_huge", 50_000, 2**62),      # >= $500
)


def value_tier_counts(sf_dir: str) -> pd.DataFrame:
    """Broadcast BANDED RANGE JOIN (the classic dimension-band lookup —
    events joined to a small tier table on lo <= value < hi). A
    shuffle join on an inequality predicate is the wrong physical plan
    at any scale; the scale-correct form when one side is a handful of
    bands is: broadcast the sorted band edges, assign each row its
    band with one vectorized ``searchsorted`` inside ``map_batches``,
    and pre-aggregate (event_type, tier) counts in the same pass so
    the only exchange is the tiny per-batch partial table. Values
    convert to integer cents first (floor(v*100+0.5)) so the band
    predicate is bit-portable across engines.

    Returns (event_type, tier, n) sorted by (event_type, tier)."""
    edges = np.array([t[1] for t in VALUE_TIERS], np.int64)
    his = np.array([t[2] for t in VALUE_TIERS], np.int64)
    names = [t[0] for t in VALUE_TIERS]

    def fn(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        tier_ix = np.searchsorted(edges, cents, side="right") - 1
        et = batch["event_type"].to_pylist()
        counts: dict[tuple[str, int], int] = {}
        for e, t, c in zip(et, tier_ix, cents):
            if t < 0 or c >= his[t]:
                continue  # outside every band (negative / >= last hi)
            k = (e, int(t))
            counts[k] = counts.get(k, 0) + 1
        keys = sorted(counts)
        return pa.table({
            "event_type": pa.array([k[0] for k in keys], pa.string()),
            "tier": pa.array([names[k[1]] for k in keys], pa.string()),
            "n": pa.array([counts[k] for k in keys], pa.int64()),
        })

    out = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(fn, batch_format="pyarrow")
        .groupby(["event_type", "tier"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "tier"]).reset_index(drop=True)
