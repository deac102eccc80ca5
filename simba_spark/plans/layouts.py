"""Layouts — the engine's analog of the reference's two-level indexes.

The reference builds RDD-level indexed relations: a spatial partitioner,
a per-partition local index, and a driver-side global index of partition
bounds (ref: index/IndexedRelation.scala:30,49-60,
RTreeIndexedRelation.scala:61-87), managed by an IndexManager with
create/drop/persist/load DDL (ref: IndexManager.scala:35-318).

Our engine replaces that runtime structure with a *layout*:

- the DataFrame is z-order (or range) clustered and either cached or
  written as Parquet — clustering makes Parquet row-group min/max stats
  selective, which does the local index's job for free;
- a small driver-side **bounds table** (one row per partition: min/max
  per dimension + count) is the global index analog, used to prune
  partitions before a scan;
- a Python registry keyed by name is the IndexManager analog, with
  persist/load = Parquet + JSON metadata
  (ref parity: IndexManager.persistIndex/loadIndex, scala:122-176).

At the 100 TB design point the bounds table is one row per partition
(~thousands of rows) — constant driver memory; the data itself never
visits the driver.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions import z_value_col

ZCOL = "__simba_z"


@dataclass
class Layout:
    name: str
    cols: list
    kind: str                      # 'zorder' | 'range' (1-D) | 'hash'
    df: DataFrame                  # clustered (and persisted) data
    bounds: list = field(default_factory=list)  # [{pid, count, min_i, max_i...}]
    mins: list = field(default_factory=list)
    maxs: list = field(default_factory=list)
    source_path: Optional[str] = None
    data: Optional[DataFrame] = None  # df without the internal z column

    def candidate_partitions(self, low: Sequence[float], high: Sequence[float]):
        """Global-index probe: partitions whose bounds box intersects the
        closed query box (ref analog: global R-tree range,
        IndexedRelationScan.scala:57-87)."""
        out = []
        for b in self.bounds:
            hit = all(
                b[f"min_{i}"] is not None
                and not (b[f"max_{i}"] < low[i] or b[f"min_{i}"] > high[i])
                for i in range(len(self.cols))
            )
            if hit:
                out.append(b["pid"])
        return out


class LayoutRegistry:
    """Name → Layout registry (IndexManager analog,
    ref: IndexManager.scala:35-51,189-318)."""

    def __init__(self, ctx):
        self.ctx = ctx
        self._layouts: dict = {}
        # df-identity → name for transparent routing of filter calls
        self._by_df_id: dict = {}

    # -- DDL --------------------------------------------------------------
    def create(
        self,
        df: DataFrame,
        cols: Sequence[str],
        name: str,
        kind: str = "zorder",
        num_partitions: Optional[int] = None,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ) -> Layout:
        """Cluster df on cols and register as `name`.

        zorder: interleave dims on a 2^bits grid → repartitionByRange on
        the z key → sortWithinPartitions (spatial locality in every
        partition and every Parquet row group).
        range: 1-D repartitionByRange (TreeMap/Treap analog,
        ref: TreeMapIndexedRelation.scala:41-60).
        hash: hash partitioning on the key (HashMap analog,
        ref: HashMapIndexedRelation.scala:39-56).
        """
        cols = list(cols)
        n = num_partitions or min(
            self.ctx.conf.index_partitions,
            max(1, df.sparkSession.sparkContext.defaultParallelism * 2),
        )
        if kind == "zorder":
            stats = df.agg(
                *[F.min(c).alias(f"mn{i}") for i, c in enumerate(cols)],
                *[F.max(c).alias(f"mx{i}") for i, c in enumerate(cols)],
            ).collect()[0]
            bits = int(self.ctx.conf.get("simba_spark.zorder.bits", 21))
            bits = min(bits, 62 // len(cols))
            mins = [float(stats[f"mn{i}"]) for i in range(len(cols))]
            maxs = [float(stats[f"mx{i}"]) for i in range(len(cols))]
            spans = [mx - mn if mx > mn else 1.0 for mn, mx in zip(mins, maxs)]
            scale = (1 << bits) - 1
            ints = [
                F.least(
                    F.lit(scale),
                    F.greatest(
                        F.lit(0),
                        F.round((F.col(c) - F.lit(mn)) / F.lit(sp) * F.lit(scale)).cast("long"),
                    ),
                )
                for c, mn, sp in zip(cols, mins, spans)
            ]
            keyed = df.withColumn(ZCOL, z_value_col(ints, bits=bits))
            clustered = (
                keyed.repartitionByRange(n, F.col(ZCOL))
                .sortWithinPartitions(ZCOL)
            )
        elif kind == "range":
            assert len(cols) == 1, "range layout is 1-D (TreeMap/Treap analog)"
            mins = maxs = []
            clustered = (
                df.withColumn(ZCOL, F.col(cols[0]).cast("double"))
                .repartitionByRange(n, F.col(ZCOL))
                .sortWithinPartitions(ZCOL)
            )
        elif kind == "hash":
            assert len(cols) == 1, "hash layout is 1-D"
            mins = maxs = []
            clustered = df.withColumn(ZCOL, F.col(cols[0])).repartition(n, *cols)
        else:
            raise ValueError(f"unknown layout kind: {kind}")

        clustered = clustered.persist(storage_level)
        bounds = self._collect_bounds(clustered, cols)
        data = clustered.drop(ZCOL)
        layout = Layout(
            name=name, cols=cols, kind=kind, df=clustered,
            bounds=bounds, mins=list(mins), maxs=list(maxs), data=data,
        )
        self._layouts[name] = layout
        # register both handles: the raw clustered df (with z column) and
        # the clean projection; .drop is a narrow op, so partition ids —
        # and therefore the bounds table — stay valid for both
        self._by_df_id[id(clustered)] = name
        self._by_df_id[id(data)] = name
        return layout

    def _collect_bounds(self, df: DataFrame, cols) -> list:
        """Driver-side bounds table: one row per partition (global index
        analog). Cheap: a single map-side agg over the clustered data."""
        aggs = [F.count(F.lit(1)).alias("count")]
        for i, c in enumerate(cols):
            aggs += [F.min(c).alias(f"min_{i}"), F.max(c).alias(f"max_{i}")]
        rows = (
            df.groupBy(F.spark_partition_id().alias("pid")).agg(*aggs).collect()
        )
        return [r.asDict() for r in rows]

    def drop(self, name: str) -> bool:
        lay = self._layouts.pop(name, None)
        if lay is None:
            return False
        self._by_df_id.pop(id(lay.df), None)
        try:
            lay.df.unpersist()
        except Exception:
            pass
        return True

    def has(self, name: str) -> bool:
        return name in self._layouts

    def get(self, name: str) -> Optional[Layout]:
        return self._layouts.get(name)

    def show(self):
        return [
            {"name": l.name, "cols": l.cols, "kind": l.kind,
             "partitions": len(l.bounds),
             "rows": sum(b["count"] for b in l.bounds)}
            for l in self._layouts.values()
        ]

    def clear(self):
        for name in list(self._layouts):
            self.drop(name)

    # -- persist / load (ref: IndexManager.scala:122-176) ----------------
    def persist(self, name: str, path: str) -> str:
        lay = self._layouts[name]
        data_path = os.path.join(path, "data")
        # one file per partition, rows already sorted by the cluster key ⇒
        # Parquet row-group stats stay tight
        lay.df.write.mode("overwrite").parquet(data_path)
        meta = {
            "name": lay.name, "cols": lay.cols, "kind": lay.kind,
            "bounds": lay.bounds, "mins": lay.mins, "maxs": lay.maxs,
            "zcol": ZCOL,
        }
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "layout.json"), "w") as f:
            json.dump(meta, f, default=str)
        lay.source_path = path
        return path

    def load(self, name: str, path: str) -> Layout:
        with open(os.path.join(path, "layout.json")) as f:
            meta = json.load(f)
        df = self.ctx.spark.read.parquet(os.path.join(path, "data"))
        # IMPORTANT: the reader's partition↔file mapping differs from the
        # writer's partitioning, so persisted pids are stale — recompute
        # the bounds table against the reader's partitioning (cheap
        # map-side agg; one row per partition to the driver).
        bounds = self._collect_bounds(df, meta["cols"])
        data = df.drop(meta.get("zcol", ZCOL))
        layout = Layout(
            name=name, cols=meta["cols"], kind=meta["kind"], df=df,
            bounds=bounds,
            mins=[float(m) for m in meta["mins"]],
            maxs=[float(m) for m in meta["maxs"]],
            source_path=path,
            data=data,
        )
        self._layouts[name] = layout
        self._by_df_id[id(df)] = name
        self._by_df_id[id(data)] = name
        return layout

    # -- routing ----------------------------------------------------------
    def layout_for(self, df: DataFrame) -> Optional[Layout]:
        name = self._by_df_id.get(id(df))
        return self._layouts.get(name) if name else None

    def prune_for_range(self, df: DataFrame, cols, low, high) -> DataFrame:
        """If df is a registered layout on these cols, drop partitions
        whose bounds cannot intersect [low, high] (global-index pruning,
        ref analog: PartitionPruningRDD use at
        IndexedRelationScan.scala:57,87). Semantically a no-op: only
        provably-empty partitions are removed."""
        lay = self.layout_for(df)
        if lay is None or list(cols) != lay.cols or not lay.bounds:
            return df
        cands = lay.candidate_partitions([float(x) for x in low], [float(x) for x in high])
        if len(cands) == len(lay.bounds):
            return df
        return df.filter(F.spark_partition_id().isin(cands))
