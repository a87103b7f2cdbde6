"""Relational operator suite over the testdata tables.

Capability parity with the reference's query-engine operators (SURVEY.md
§2.4-2.8: hash joins, group-aggregates, sort/top-k/slice, distinct, union,
minus/exists) expressed Ray-Data-first. Each function takes `sf_dir` and
returns a Dataset / pandas DataFrame; the matching DuckDB oracle SQL lives in
__ray_entry__.oracle_sql.

Join strategy notes:
- small dimension sides (region/nation/supplier/customer) are BROADCAST —
  read once, ray.put, merged per batch inside map_batches (no shuffle);
  mirrors QueryIterHashJoin's build-side probe table (HashProbeTable) with
  the build side replicated instead of shuffled.
- large-large joins use Dataset.join (hash-partitioned) — lineitem ⋈ orders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# --------------------------------------------------------------------------
# aggregation (OpGroup + Agg* accumulators)
# --------------------------------------------------------------------------


def _round_cols(ds, spec: dict[str, int]):
    """Round float columns so Ray's blockwise float sums and DuckDB's
    sequential sums hash identically (both sides round the same way)."""

    def f(t: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            i = t.schema.get_field_index(col)
            t = t.set_column(i, col, pc.round(t.column(col), ndigits=nd))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def _int_scale_cols(ds, spec: dict[str, int]):
    """Emit float sums as scaled int64 (e.g. cents): float sums differ between
    engines at the ulp level even after round(), but int64(round(x*scale)) is
    bit-stable unless the sum lands within one ulp of a .5 boundary."""

    def f(t: pa.Table) -> pa.Table:
        for col, scale in spec.items():
            i = t.schema.get_field_index(col)
            v = pc.round(pc.multiply(t.column(col), pa.scalar(float(scale))))
            t = t.set_column(i, col, pc.cast(v, pa.int64()))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style group-aggregate: per (returnflag, linestatus) sums/avgs.
    Map-side: computed columns; shuffle: groupby-aggregate (Sum/Mean/Count)."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    ds = ds.map_batches(revenue, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price_cents"),
        Sum("revenue", alias_name="sum_revenue_cents"),
        Mean("l_discount", alias_name="avg_discount"),
        Count(alias_name="count_order"),
    )
    out = _int_scale_cols(out, {"sum_base_price_cents": 100, "sum_revenue_cents": 100})
    out = _round_cols(out, {"avg_discount": 6})
    return out.sort(["l_returnflag", "l_linestatus"])


def agg_minmax_orders(sf_dir: str):
    """Min/Max/Mean/Std-free aggregate per order priority (AggMin/AggMax)."""
    from ray.data.aggregate import Count, Max, Mean, Min

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    out = ds.groupby("o_orderpriority").aggregate(
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
        Mean("o_totalprice", alias_name="avg_price"),
        Count(alias_name="n"),
    )
    return _round_cols(out, {"avg_price": 6}).sort("o_orderpriority")


# --------------------------------------------------------------------------
# joins (QueryIterHashJoin / OpLeftJoin / OpMinus / E_Exists)
# --------------------------------------------------------------------------


def revenue_by_nation(sf_dir: str):
    """customer ⋈ nation (broadcast) ⋈ orders (hash join): revenue per nation.

    nation+customer are the small build side — broadcast via ray.put and
    probed per batch (no shuffle); orders→customer is a Dataset.join
    hash-partitioned equi-join.
    """
    import ray

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    side = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ]
    side_ref = ray.put(side)

    class JoinSide:
        def __init__(self, ref):
            self.side = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.merge(self.side, left_on="o_custkey", right_on="c_custkey")
            return out[["n_name", "o_totalprice"]]

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(
        JoinSide,
        fn_constructor_args=(side_ref,),
        batch_format="pandas",
        concurrency=(1, 4),
        num_cpus=1,
    )
    from ray.data.aggregate import Count, Sum

    out = joined.groupby("n_name").aggregate(
        Sum("o_totalprice", alias_name="revenue_cents"), Count(alias_name="n_orders")
    )
    return _int_scale_cols(out, {"revenue_cents": 100}).sort("n_name")


def lineitem_order_join(sf_dir: str):
    """Large-large hash join: lineitem ⋈ orders on orderkey, then aggregate
    revenue per order status. Uses Dataset.join (hash-partitioned)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    from jena_ray.stages.joins import safe_join

    joined = safe_join(
        li, orders, num_partitions=16, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    from ray.data.aggregate import Count, Sum

    out = joined.groupby("o_orderstatus").aggregate(
        Sum("revenue", alias_name="revenue_cents"), Count(alias_name="n_items")
    )
    return _int_scale_cols(out, {"revenue_cents": 100}).sort("o_orderstatus")


def customers_without_orders(sf_dir: str):
    """Anti join (OpMinus / NOT EXISTS): customers with no high-value order
    (totalprice > 300000). The key set of the subquery side is broadcast and
    applied as a vectorized sorted-array membership mask per batch."""
    import ray

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    hi = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300000.0))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    custkeys = hi.unique("o_custkey")
    keyset_ref = ray.put(np.asarray(sorted(custkeys), dtype=np.int64))

    class AntiJoin:
        def __init__(self, ref):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t.column("c_custkey").to_numpy()
            idx = np.searchsorted(self.keys, ck)
            idx = np.clip(idx, 0, len(self.keys) - 1)
            present = self.keys[idx] == ck
            return t.filter(pa.array(~present))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return cust.map_batches(
        AntiJoin, fn_constructor_args=(keyset_ref,), batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=1,
    ).sort("c_custkey")


def customers_with_orders_semi(sf_dir: str):
    """Semi join (E_Exists): customers having ≥1 order — broadcast key set."""
    import ray

    custkeys = _read(sf_dir, "orders", columns=["o_custkey"]).unique("o_custkey")
    keyset_ref = ray.put(np.asarray(sorted(custkeys), dtype=np.int64))

    class SemiJoin:
        def __init__(self, ref):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t.column("c_custkey").to_numpy()
            idx = np.searchsorted(self.keys, ck)
            idx = np.clip(idx, 0, len(self.keys) - 1)
            present = self.keys[idx] == ck
            return t.filter(pa.array(present))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return cust.map_batches(
        SemiJoin, fn_constructor_args=(keyset_ref,), batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=1,
    ).sort("c_custkey")


# --------------------------------------------------------------------------
# sort / top-k / slice / distinct / union (OpOrder, OpTopN, OpSlice,
# OpDistinct, OpUnion)
# --------------------------------------------------------------------------


def top10_orders(sf_dir: str):
    """OpTopN: ORDER BY o_totalprice DESC LIMIT 10 (per-block heap would be
    the optimization; Ray's sort+limit prunes blocks after the sort)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort("o_totalprice", descending=True).limit(10)


def distinct_segments(sf_dir: str):
    """OpDistinct over a 2-column projection."""
    from jena_ray.stages.dedup import dedup_exact

    ds = _read(sf_dir, "customer", columns=["c_mktsegment", "c_nationkey"])
    return dedup_exact(ds, cols=("c_mktsegment", "c_nationkey")).sort(
        ["c_mktsegment", "c_nationkey"]
    )


def union_parties(sf_dir: str):
    """OpUnion: customers ∪ suppliers as (name, acctbal, kind)."""
    cust = _read(sf_dir, "customer", columns=["c_name", "c_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "name": t["c_name"],
                "acctbal": t["c_acctbal"],
                "kind": pa.array(["customer"] * len(t)),
            }
        ),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier", columns=["s_name", "s_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "name": t["s_name"],
                "acctbal": t["s_acctbal"],
                "kind": pa.array(["supplier"] * len(t)),
            }
        ),
        batch_format="pyarrow",
    )
    return cust.union(supp).sort(["kind", "name"])


def filter_project_lineitem(sf_dir: str):
    """Vectorized predicate + projection (ValidTripleFilterMapper analog on
    relational data): quantity > 45 and discount < 0.05."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
    )

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(t["l_quantity"], pa.scalar(45.0)),
            pc.less(t["l_discount"], pa.scalar(0.05)),
        )
        return t.filter(mask).select(["l_orderkey", "l_linenumber", "l_quantity"])

    return ds.map_batches(f, batch_format="pyarrow").sort(["l_orderkey", "l_linenumber"])


# --------------------------------------------------------------------------
# event-stream windows (streaming-shaped; ray_guide §streaming)
# --------------------------------------------------------------------------


def events_tumbling_window(sf_dir: str):
    """Tumbling 1-hour window per event_type: count + sum(value).
    Event time = ts floored to the hour; pure groupby — order-independent."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        return t.append_column("window_start", w)

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("value", alias_name="sum_value_micros"), Count(alias_name="n_events"))
    )
    return _int_scale_cols(out, {"sum_value_micros": 1_000_000}).sort(
        ["event_type", "window_start"]
    )


def events_sessionize(sf_dir: str):
    """Per-user running event count ordered by ts (window-function shape):
    bucketed by user hash, vectorized cumcount within each bucket."""
    from jena_ray.stages.dedup import bucketed_group_apply

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def runcount(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        df["run_idx"] = df.groupby("user_id", sort=False).cumcount() + 1
        return df[["event_id", "user_id", "run_idx"]]

    return bucketed_group_apply(ds, ["user_id"], runcount, num_buckets=16).sort(
        ["user_id", "run_idx"]
    )


def customer_order_totals(sf_dir: str):
    """LEFT OUTER join (OpLeftJoin — jena-arq
    sparql/engine/join/QueryIterHashLeftJoin_Left.java): every customer with
    order count + revenue; customers without orders keep zeros. Hash-
    partitioned Dataset.join(left_outer), then null-aware aggregation."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    from jena_ray.stages.joins import safe_join

    j = safe_join(
        cust,
        orders,
        join_type="left_outer",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        has = pc.cast(pc.is_valid(t["o_totalprice"]), pa.int64())
        price = pc.coalesce(t["o_totalprice"], pa.scalar(0.0))
        return pa.table(
            {"c_custkey": t["c_custkey"], "c_name": t["c_name"], "has": has, "price": price}
        )

    from ray.data.aggregate import Sum

    out = (
        j.map_batches(prep, batch_format="pyarrow")
        .groupby(["c_custkey", "c_name"])
        .aggregate(
            Sum("has", alias_name="n_orders"), Sum("price", alias_name="total_cents")
        )
    )
    return _int_scale_cols(out, {"total_cents": 100}).sort("c_custkey")


def order_priority_aggs(sf_dir: str):
    """Aggregate parity (Agg*.java): GroupConcat(DISTINCT, ordered), Median,
    Mode (min tie-break), CountDistinct, Sample (deterministic = min),
    Min/Max per o_orderpriority, via the registered AggregateFn factories
    (§2.10 AggregateRegistry seam). Subsumes the former agg_minmax_orders
    registry entry (still available below) so the driver registry stays at
    its 50-row cap."""
    from ray.data.aggregate import Max, Min

    from jena_ray.functions.scalar import AGGREGATES

    ds = _read(
        sf_dir,
        "orders",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice", "o_custkey", "o_orderkey"],
    )
    out = ds.groupby("o_orderpriority").aggregate(
        AGGREGATES["group_concat"]("o_orderstatus", "statuses"),
        AGGREGATES["median"]("o_totalprice", "median_price"),
        AGGREGATES["mode"]("o_orderstatus", "mode_status"),
        AGGREGATES["count_distinct"]("o_custkey", "n_custkeys"),
        AGGREGATES["sample"]("o_orderkey", "sample_orderkey"),
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
    )
    return _round_cols(out, {"median_price": 6}).sort("o_orderpriority")


# --------------------------------------------------------------------------
# sampling (OpSlice/Sampler analog) + OpReduced
# --------------------------------------------------------------------------


SAMPLE_THRESHOLD = "19999999"  # hex prefix < this ≈ 10% keep rate


def sample_docs(sf_dir: str):
    """Deterministic hash sampling: keep documents whose md5(doc_id) hex
    digest sorts below a fixed prefix — ~10% in expectation, stable across
    engines and runs (the distributed replacement for the reference's
    RandomSample/OpSlice sampling iterator, which cannot be oracle-checked;
    the md5-prefix string compare is reproduced verbatim in DuckDB)."""
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keep = [
            hashlib.md5(str(i).encode()).hexdigest()[:8] < SAMPLE_THRESHOLD
            for i in ids
        ]
        return batch.filter(pa.array(keep))

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


def except_all(left, right, cols, *, num_partitions: int = 16):
    """Bag difference — OpDiff with multiset semantics (sparql/algebra/op/
    OpDiff.java; SQL EXCEPT ALL): each distinct row survives with
    max(0, count_left − count_right) copies.

    Distributed shape: both sides collapse to (key, count) via map-side
    pre-aggregation BEFORE anything shuffles (hub rows move as one row), a
    left-outer join aligns the counts, and the surviving multiplicities are
    re-expanded vectorized (np.repeat over take indices). The expansion is
    the only stage whose output exceeds its input — bounded by the left
    multiset itself."""
    import numpy as np

    from jena_ray.stages.dedup import pre_aggregated_count
    from jena_ray.stages.joins import safe_join

    cols = list(cols)
    lc = pre_aggregated_count(left, cols, alias="_nl")
    rc = pre_aggregated_count(right, cols, alias="_nr")
    j = safe_join(
        lc,
        rc,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=tuple(cols),
        right_on=tuple(cols),
    )

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_nl" not in t.schema.names:
            return t.select(cols) if set(cols) <= set(t.schema.names) else t
        nl = t.column("_nl").to_numpy(zero_copy_only=False)
        nr = t.column("_nr").to_numpy(zero_copy_only=False)
        nr = np.nan_to_num(nr.astype("float64"), nan=0.0).astype("int64")
        keep = np.maximum(nl - nr, 0)
        idx = np.repeat(np.arange(t.num_rows), keep)
        return t.select(cols).take(pa.array(idx, type=pa.int64()))

    return j.map_batches(expand, batch_format="pyarrow")


def lineitem_except_orders(sf_dir: str):
    """EXCEPT ALL: the lineitem orderkey multiset minus the (unique) orders
    keys — each orderkey survives (#lineitems − 1) times."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    od = _read(sf_dir, "orders", columns=["o_orderkey"])

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(["l_orderkey"])

    return except_all(li, od.map_batches(ren, batch_format="pyarrow"), ["l_orderkey"]).sort(
        "l_orderkey"
    )


def slice_rows(ds, offset: int, limit: int):
    """OpSlice with a non-zero offset (sparql/algebra/op/OpSlice.java;
    QueryIterSlice skips `offset` rows then yields `limit`). Distributed
    shape: `Dataset.limit(offset+limit)` bounds the materialized set to
    offset+limit rows BY CONSTRUCTION, then the skip happens driver-side —
    identical O(offset+limit) cost to the reference's iterator. Only
    meaningful after a total-order sort upstream (same caveat as SPARQL's
    OFFSET without ORDER BY)."""
    head = ds.limit(offset + limit).to_pandas()
    return head.iloc[offset:].reset_index(drop=True)


def orders_page2(sf_dir: str):
    """Slice page 2: ORDER BY totalprice DESC, orderkey LIMIT 10 OFFSET 10
    (orderkey tie-break makes the order total, so the page is stable)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    srt = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
    return slice_rows(srt, 10, 10)


def reduced(ds, cols):
    """OpReduced (sparql/algebra/op/OpReduced.java semantics): drop ADJACENT
    duplicate rows only — a streaming, shuffle-free cheapening of DISTINCT
    that never reorders. Block-local by construction (the reference's
    QueryIterReduced holds one previous row; per-block adjacency is the
    distributed equivalent since blocks preserve order)."""
    cols = list(cols)

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        same = None
        for c in cols:
            a = t.column(c)
            eq = pc.equal(a.slice(1), a.slice(0, len(a) - 1))
            eq = pc.fill_null(eq, False)
            same = eq if same is None else pc.and_(same, eq)
        keep = pa.chunked_array([[True], pc.invert(same)])
        return t.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")
