"""simba-pyspark: a PySpark-native spatial + data-pipeline analytics engine.

Re-expresses the query capabilities of the reference engine
(InitialDLab/Simba — see SURVEY.md) as idiomatic DataFrame programs:
spatial predicates are codegen-friendly Column arithmetic, indexes are
persisted layouts with driver-side bounds tables, and the eleven
hand-written join operators become a strategy router over grid-cell
equi-joins / broadcast joins / window top-k / z-order approximations.
"""

from .context import SimbaConf, SimbaContext, get_spark
from .functions import (
    cosine_similarity,
    dist,
    dist2,
    dist2_cols,
    dist_cols,
    grid_cell,
    in_circle_range,
    in_range,
    register_sql_functions,
    vec_dot,
    vec_norm,
    z_value_col,
)
from .geometry import MBR, Circle, Dist, LineSegment, Point, Polygon, Shape, z_value
from .operators.distance_join import distance_join, self_distance_join
from .operators.filters import circle_range, knn, knn_and, knn_not, knn_or, range_query
from .operators.asof import asof_join
from .operators.interval import interval_join, interval_overlap_join
from .operators.knn_join import knn_join, zknn_join
from .operators.polygon import (
    in_polygon,
    in_polygon_col,
    polygon_distance_join,
    polygon_intersects_box_col,
    polygon_intersects_circle_col,
    polygon_range,
)
from .operators.analytics import (
    top_paths,
    attribution,
    basket_rules,
    cohort_retention,
    funnel,
    transition_matrix,
    volume_anomaly,
    volume_baseline,
)
from .operators.clustering import kmeans
from .operators.dedup import edit_distance_pairs, linkage_score
from .operators.graph import (adamic_adar, hyperanf, k_core, k_hop,
                              label_propagation, modularity, pagerank,
                              personalized_pagerank, shortest_paths,
                              triangle_count)
from .operators.text import (bigram_lm_score, bm25_topk, build_vocab,
                             phrase_search)
from .operators.shapes import (
    circle_struct,
    mbr_struct,
    segment_struct,
    shape_circle_range,
    shape_range,
)
from .operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
    kmv_theta,
)
from .operators.sketches import (
    cm_estimate,
    cm_join_size,
    cm_merge,
    cm_sketch,
    quantile_digest,
    quantile_estimate,
    quantile_merge,
    quantile_sketch,
    theta_estimate,
    theta_intersect,
    theta_merge,
    theta_sketch,
)
from .operators.retrieval import rrf_fuse
from .operators.similarity import ann_topk
from .operators.pq import (build_ivfpq_layout, build_pq_layout,
                           ivfpq_topk, load_pq_layout, pq_encode,
                           pq_topk, pq_topk_layout, pq_train)
from .operators.pca import fit_pca, pca_project
from .operators.pipeline import rank_normalize
from .operators.timeseries import (acf, cusum, cusum_baseline,
                                    forecast_seasonal_naive, linreg_series,
                                    rollup_finalize, rollup_merge,
                                    rollup_state)
from .operators.stats import (benford, chisq_independence, corr_matrix,
                              cov_matrix, gini, heavy_hitters,
                              histogram_fixed, ks_test,
                              mutual_information, psi_drift, robust_zscore,
                              skew_report, welch_ttest)
from .partitioners import (
    assign_partitions,
    hash_partition,
    kd_partition,
    partition_sizes,
    range_partition,
    str_partition,
    voronoi_partition,
    zorder_partition,
)

__version__ = "0.1.0"

__all__ = [
    "SimbaConf", "SimbaContext", "get_spark",
    "Point", "MBR", "Circle", "LineSegment", "Polygon", "Shape", "Dist", "z_value",
    "dist", "dist2", "dist_cols", "dist2_cols", "in_range", "in_circle_range",
    "grid_cell", "z_value_col", "vec_dot", "vec_norm", "cosine_similarity",
    "register_sql_functions",
    "range_query", "circle_range", "knn", "knn_and", "knn_or", "knn_not",
    "distance_join", "self_distance_join", "knn_join", "zknn_join",
    "interval_join", "interval_overlap_join", "asof_join",
    "in_polygon", "in_polygon_col", "polygon_range",
    "polygon_intersects_box_col", "polygon_intersects_circle_col",
    "polygon_distance_join",
    "mbr_struct", "segment_struct", "circle_struct",
    "shape_range", "shape_circle_range",
    "hll_distinct", "hll_sketch", "hll_merge", "hll_estimate", "kmv_theta",
    "quantile_sketch", "quantile_merge", "quantile_estimate", "quantile_digest",
    "cm_sketch", "cm_merge", "cm_estimate", "cm_join_size",
    "theta_sketch", "theta_merge", "theta_estimate", "theta_intersect",
    "ann_topk", "rrf_fuse",
    "pq_train", "pq_encode", "pq_topk", "pq_topk_layout",
    "build_pq_layout", "load_pq_layout", "build_ivfpq_layout",
    "ivfpq_topk",
    "pagerank", "personalized_pagerank", "triangle_count",
    "label_propagation", "k_hop", "k_core", "adamic_adar",
    "shortest_paths",
    "histogram_fixed", "heavy_hitters",
    "corr_matrix", "cov_matrix", "fit_pca", "pca_project", "skew_report",
    "chisq_independence", "rank_normalize", "robust_zscore", "psi_drift",
    "rollup_state", "rollup_merge", "rollup_finalize",
    "forecast_seasonal_naive", "acf", "cusum", "cusum_baseline",
    "linreg_series", "modularity", "hyperanf",
    "ks_test", "welch_ttest", "mutual_information", "top_paths",
    "gini", "benford",
    "kmeans", "linkage_score", "edit_distance_pairs",
    "funnel", "cohort_retention", "volume_anomaly", "volume_baseline",
    "attribution", "transition_matrix", "basket_rules",
    "bm25_topk", "phrase_search", "build_vocab", "bigram_lm_score",
    "str_partition", "kd_partition", "voronoi_partition", "zorder_partition",
    "hash_partition", "range_partition", "assign_partitions",
    "partition_sizes",
]
