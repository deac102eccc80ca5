"""SimbaContext — thin session wrapper + engine configuration.

The reference couples a SparkSession with an index manager and a spatial
planner (ref: SimbaSession.scala:40-45, SimbaSessionState.scala:40-49).
Our engine keeps a *plain* SparkSession and adds:

- an engine conf mirroring the reference's knob list
  (ref: SimbaConf.scala:111-154),
- a layout registry (the "index manager" analog — see
  :mod:`simba_spark.plans.layouts`),
- registration of the ``st_*`` SQL function surface.

No Catalyst modifications: every operator compiles to DataFrame programs
that Catalyst optimizes natively (SURVEY.md §3 "Our lifecycle").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


#: Engine defaults, mirroring the reference configuration surface
#: (ref: SimbaConf.scala:111-154). Keys are re-namespaced under
#: ``simba_spark.*`` but keep the reference's semantics and defaults.
DEFAULTS = {
    "simba_spark.index.partitions": 200,        # simba.index.partitions
    "simba_spark.join.partitions": 200,         # simba.join.partitions
    "simba_spark.join.distanceJoin": "grid",    # simba.join.distanceJoin=DJSpark
    "simba_spark.join.knnJoin": "bounded",      # simba.join.knnJoin=RKJSpark
    "simba_spark.join.zknn.shiftTimes": 2,      # simba.join.zknn.shiftTimes
    "simba_spark.join.rkj.thetaBoost": 16,      # simba.join.rkj.thetaBoost
    "simba_spark.sampleRate": 0.01,             # simba.sampleRate
    "simba_spark.seed": 42,                     # determinism (oracle harness)
    "simba_spark.zorder.bits": 21,              # z-curve resolution per dim
    # simba.join.voronoi.pivotSetSize=10 — ours defaults higher (finer
    # cells cost only driver math here, not a per-partition scan)
    "simba_spark.join.voronoi.pivotSetSize": 32,
    # simba.index.selectivityThreshold=0.8 (selectivityEnable is always
    # on here: skipping the rewrite on non-selective boxes is free)
    "simba_spark.layout.selectivity_threshold": 0.8,
    # simba.transferThreshold=800MB gated the BKJ broadcast; ours is
    # deliberately conservative (plan-measured bytes, not row count)
    "simba_spark.knnjoin.broadcast_bytes": 8 << 20,
}


@dataclass
class SimbaConf:
    """Mutable engine conf with reference-parity defaults."""

    values: dict = field(default_factory=lambda: dict(DEFAULTS))

    def get(self, key: str, default=None):
        return self.values.get(key, default)

    def set(self, key: str, value) -> "SimbaConf":
        self.values[key] = value
        return self

    @property
    def join_partitions(self) -> int:
        return int(self.get("simba_spark.join.partitions"))

    @property
    def index_partitions(self) -> int:
        return int(self.get("simba_spark.index.partitions"))

    @property
    def distance_join_algo(self) -> str:
        return str(self.get("simba_spark.join.distanceJoin"))

    @property
    def knn_join_algo(self) -> str:
        return str(self.get("simba_spark.join.knnJoin"))

    @property
    def zknn_shifts(self) -> int:
        return int(self.get("simba_spark.join.zknn.shiftTimes"))

    @property
    def sample_rate(self) -> float:
        return float(self.get("simba_spark.sampleRate"))

    @property
    def seed(self) -> int:
        return int(self.get("simba_spark.seed"))

    @property
    def voronoi_pivots(self) -> int:
        return int(self.get("simba_spark.join.voronoi.pivotSetSize"))

    @property
    def selectivity_threshold(self) -> float:
        return float(self.get("simba_spark.layout.selectivity_threshold"))

    @property
    def knnjoin_broadcast_bytes(self) -> int:
        return int(self.get("simba_spark.knnjoin.broadcast_bytes"))


class SimbaContext:
    """Session facade: ``ctx = SimbaContext(spark)``.

    Exposes the DataFrame-level verbs of the reference public API
    (ref: DataSet.scala:56-226, SimbaSession.scala:47-79) as module
    functions bound to this context's conf + layout registry.
    """

    def __init__(self, spark: SparkSession, conf: Optional[SimbaConf] = None):
        self.spark = spark
        self.conf = conf or SimbaConf()
        # layout registry: name -> Layout (index manager analog,
        # ref: IndexManager.scala:35-51)
        from .plans.layouts import LayoutRegistry

        self.layouts = LayoutRegistry(self)
        from .functions import register_sql_functions

        register_sql_functions(spark)

    def sql(self, query: str) -> DataFrame:
        """`spark.sql` with the `st_*` spatial functions guaranteed
        registered (SQL mode — dropped in the standalone reference,
        restored here; functions inline to JVM expressions)."""
        return self.spark.sql(query)

    # -- filters ----------------------------------------------------------
    def range_query(self, df: DataFrame, cols, low, high) -> DataFrame:
        from .operators.filters import range_query

        return range_query(df, cols, low, high, registry=self.layouts)

    def circle_range(self, df: DataFrame, cols, center, radius) -> DataFrame:
        from .operators.filters import circle_range

        return circle_range(df, cols, center, radius, registry=self.layouts)

    def knn(self, df: DataFrame, cols, query_point, k: int, tiebreak=None) -> DataFrame:
        from .operators.filters import knn

        return knn(df, cols, query_point, k, tiebreak=tiebreak, registry=self.layouts)

    # -- spherical (WGS-84 lat/lon) ----------------------------------------
    def geo_circle_range(self, df: DataFrame, lat_col, lon_col, center,
                         radius_km) -> DataFrame:
        """Great-circle range — layout-aware (a persisted (lat, lon)
        z-order layout prunes bucket dirs at planning time)."""
        from .operators.geo import geo_circle_range

        return geo_circle_range(df, lat_col, lon_col, center, radius_km,
                                registry=self.layouts)

    def geo_knn(self, df: DataFrame, lat_col, lon_col, center, k: int,
                tiebreak=None) -> DataFrame:
        """Great-circle kNN — layout-aware (a persisted (lat, lon)
        z-order layout routes the two-phase bound-and-prune)."""
        from .operators.geo import geo_knn

        return geo_knn(df, lat_col, lon_col, center, k,
                       tiebreak=tiebreak, registry=self.layouts)

    def geo_distance_join(self, left, right, radius_km, **kw):
        from .operators.geo import geo_distance_join

        return geo_distance_join(left, right, radius_km, **kw)

    def geo_knn_join(self, left, right, k, **kw):
        from .operators.geo import geo_knn_join

        return geo_knn_join(left, right, k, **kw)

    # -- joins ------------------------------------------------------------
    def distance_join(self, left, right, left_cols, right_cols, radius, **kw):
        from .operators.distance_join import distance_join

        kw.setdefault("algo", self.conf.distance_join_algo)
        kw.setdefault("num_partitions", self.conf.join_partitions)
        return distance_join(left, right, left_cols, right_cols, radius, **kw)

    def knn_join(self, left, right, left_cols, right_cols, k, **kw):
        from .operators.knn_join import knn_join

        kw.setdefault("algo", self.conf.knn_join_algo)
        if kw["algo"] == "voronoi":
            kw.setdefault("n_pivots", self.conf.voronoi_pivots)
        # per-call override: each context's conf governs its own joins
        # (a session-conf write here would be first-context-wins)
        kw.setdefault("broadcast_bytes", self.conf.knnjoin_broadcast_bytes)
        return knn_join(left, right, left_cols, right_cols, k, **kw)

    def zknn_join(self, left, right, left_cols, right_cols, k, **kw):
        from .operators.knn_join import zknn_join

        kw.setdefault("shifts", self.conf.zknn_shifts)
        kw.setdefault("seed", self.conf.seed)
        return zknn_join(left, right, left_cols, right_cols, k, **kw)

    # -- layouts ("indexes") ---------------------------------------------
    def create_index(self, df: DataFrame, cols, name: str, kind: str = "zorder", **kw):
        return self.layouts.create(df, cols, name, kind=kind, **kw)

    def drop_index(self, name: str) -> bool:
        return self.layouts.drop(name)

    def has_index(self, name: str) -> bool:
        return self.layouts.has(name)

    def show_index(self):
        return self.layouts.show()

    def persist_index(self, name: str, path: str):
        return self.layouts.persist(name, path)

    def load_index(self, name: str, path: str):
        return self.layouts.load(name, path)

    def clear_index(self):
        self.layouts.clear()

    def set_index_storage_level(self, name: str, storage_level) -> bool:
        """Post-hoc cache-level DDL (ref: DataSet.setStorageLevel,
        DataSet.scala:178-226)."""
        return self.layouts.set_storage_level(name, storage_level)


def get_spark(
    app_name: str = "simba_spark",
    master: str = "local[*]",
    shuffle_partitions: int = 32,
    extra_conf: Optional[dict] = None,
) -> SparkSession:
    """Opinionated local session for tests/bench; on a real cluster callers
    bring their own session (all knobs here are safe cluster-side too)."""
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # JIT code cache: whole-stage codegen emits a fresh class per
        # query stage (expression IDs differ run to run, so the janino
        # cache cannot amortize across query invocations); a session
        # running many codegen-heavy queries fills the default ~240 MB
        # ReservedCodeCacheSize, the JIT stops compiling, and every
        # later stage runs interpreted — measured: 8 repetitions of one
        # 64-register-column query in one JVM degraded 11.7 -> 36.5 s
        # monotonically at the default and held a stable 8.7-9.5 s at
        # 512 MB. Long-lived executors on a real cluster accumulate
        # generated classes the same way, so the setting is
        # scale-appropriate, not a local-bench tweak (executor opts
        # below mirror it for cluster use; in local mode the driver
        # JVM is the executor).
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
        .config("spark.executor.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
        # no nanosAsLong legacy conf: current testdata is µs-precision
        # throughout; a TIMESTAMP(NANOS) file should fail loudly at read
        # time rather than be silently reinterpreted (q_sessionize also
        # asserts the dtype it expects)
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
