"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from aerial_conversion_ray.config import EngineConfig, TileGridSpec
from aerial_conversion_ray.sources import geotiff
from aerial_conversion_ray.pipelines import (
    cluster,
    coco,
    embeddings,
    extract,
    linkgraph,
    multimodal,
    relational,
    spatial,
    sql_oracle,
    text,
    vectorize,
)

# Correctness-scale config: rep=20 amplifies the 500-row documents
# table into 10k pages so joins are non-trivial at sf0.01.
CFG = EngineConfig(pages_rep=20)

# Overlap-grid config: the reference's default tiling workflow —
# tile size in MAP UNITS (30 deg -> 600 px at 0.05 deg/px) with 10%
# overlap padding (aerial_conversion/tiles.py:40-81 quirks).
OVERLAP_CFG = EngineConfig(
    grid=TileGridSpec(tile_width=30, tile_height=30, map_units=True, offset=10.0),
    pages_rep=20,
)


def entry() -> Any:
    """Flagship pipeline (forward tile join) on sf0.001."""
    return spatial.tile_point_join("/root/testdata/sf0.001", CFG)


def _lineage_write(sf_dir: str) -> Any:
    """Resumable partitioned write of the flagship join (fresh temp
    dir per call -> deterministic manifests; resume semantics are
    exercised in tests/test_lineage.py)."""
    import tempfile

    from aerial_conversion_ray.state.lineage import resumable_write

    out_dir = tempfile.mkdtemp(prefix="aerial_lineage_")
    ds = spatial.tile_point_join(sf_dir, CFG)
    return resumable_write(ds, out_dir, part_col="tile_id", key_col="page_id")


LINEAGE_SQL = """
with tpj as ({tpj})
select tile_id as part, cast(count(*) as bigint) as n_rows,
       bit_xor(page_id * 1000003 + 7) as fingerprint,
       'written' as status
from tpj group by tile_id
"""


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # -- spatial (forward path) --
        "geocode": lambda sf: spatial.geocode_pipeline(sf, CFG),
        "cell_index": lambda sf: spatial.cell_index_pipeline(sf, CFG),
        # H3 `compact` analog: minimal multi-res covering cell set
        "cell_compact": lambda sf: spatial.cell_compact(sf, CFG),
        # 2D Pareto front: per-block staircase + one-partition merge
        "skyline": relational.skyline,
        # distributed one-pass closed-form OLS per (lang, source)
        "grouped_ols": text.grouped_ols,
        # last-touch attribution (purchase -> most recent prior click)
        "attribution_last_touch": relational.attribution_last_touch,
        # snapshot row-level diff (CDC primitive)
        "table_diff": relational.table_diff,
        # CDC apply side: MERGE INTO / last-write-wins upsert
        "upsert_apply": relational.upsert_apply,
        # SCD type-2 validity intervals from the event stream
        "scd_intervals": relational.scd_intervals,
        # nearest-facility (Voronoi) assignment + per-site fold
        "nearest_facility": spatial.nearest_facility,
        # all-points k=3 nearest-site join (broadcast kNN, no shuffle)
        "knn_join": spatial.knn_join,
        # grouped dense_rank (full per-language ranking)
        "lang_rank": text.lang_rank,
        # ordered string_agg of distinct sources per language
        "lang_sources_agg": text.lang_sources_agg,
        # exact duplicated 5-gram mass (Lee et al. substring dedup signal)
        "suffix_dedup": text.suffix_dedup,
        # NTILE(4) quartile bucketing within language
        "ntile_lang": text.ntile_lang,
        # standard base32 geohash + prefix parent (string-keyed T3)
        "geohash_index": spatial.geohash_index,
        # distance-band spatial self-join (cell ring probe + refine)
        "within_dist_join": spatial.within_dist_join,
        # zoom-pyramid cell counts (res 7/9/11 in one pass)
        "cell_pyramid": spatial.cell_pyramid,
        # global Moran's I moments (queen contiguity, integer-exact)
        "moran_i": spatial.moran_i,
        # raster blob labeling: 8-connected CC over occupied cells
        "cell_blobs": spatial.cell_blobs,
        # proper segment crossings: crawl legs x broadcast routes
        "segment_crossings": spatial.segment_crossings,
        # IDW gap-fill over the cell raster (exact integer fraction)
        "idw_fill": spatial.idw_fill,
        # zonal majority: modal lang per cell (deterministic tie-break)
        "tile_mode_lang": spatial.tile_mode_lang,
        # marching-squares isoline of the cell-count surface (sparse)
        "contour_segments": lambda sf: spatial.contour_segments(sf, CFG),
        # isoline ring assembly (CC over shared endpoints)
        "contour_rings": lambda sf: spatial.contour_rings(sf, CFG),
        # leakage-safe train/val/test by spatial block
        "spatial_split": lambda sf: spatial.spatial_split(sf, CFG),
        # real-shapefile-fed point-in-zone join (S1 as load-bearing input)
        "shapefile_zone_join": spatial.shapefile_zone_join,
        # one-pass distributed Gram matrix (PCA building block) +
        # driver-side power-iteration top component
        "embed_gram": embeddings.embed_gram,
        # per-label embedding drift between corpus halves
        "embed_drift": embeddings.embed_drift,
        # JL sign projection + integer distortion audit
        "jl_projection_audit": embeddings.jl_projection_audit,
        "pca_top_component": embeddings.pca_power_iteration,
        # full outer join (tagged narrow union, coarse-bucket fold)
        "full_outer_join": relational.full_outer_join,
        # token -> postings retrieval index (vocabulary-proof build)
        "inverted_index": text.inverted_index,
        # unicode NFC + casefold + whitespace normalization
        "text_normalize": text.text_normalize,
        # TPC-H Q3-shape 3-way join: broadcast dims, fact never shuffles
        "q3_shipping": relational.q3_shipping,
        # incremental maintenance: checkpoint + delta == full recompute
        "delta_lang_counts": text.delta_lang_counts,
        # cross-split n-gram leakage audit (self-decontamination)
        "split_leakage": text.split_leakage,
        # temperature (alpha=0.5) mixture rebalancing by lang share
        "temperature_sample": text.temperature_sample,
        # per-source convex hull (distributive hull-of-hulls reduction;
        # rows-only — property-gated in pytest)
        "source_hulls": spatial.source_hulls,
        # per-host trajectory legs (lag window x haversine)
        "crawl_path": spatial.crawl_path,
        # partition-skew audit of the flagship join (Gini over tiles)
        "tile_skew": lambda sf: spatial.tile_skew(sf, CFG),
        # Hausdorff similarity of consecutive host trajectories
        "trajectory_hausdorff": lambda sf: spatial.trajectory_hausdorff(sf, CFG),
        "reproject": lambda sf: spatial.reproject_pipeline(sf, CFG),
        "tile_point_join": lambda sf: spatial.tile_point_join(sf, CFG),
        # CRS-dispatch join: points project to EPSG:3857 and assign to
        # a mercator-extent raster's tiles (integer-mm floor on both
        # sides so libm ulps can't flip a boundary pixel)
        "tile_point_join_mercator": lambda sf: spatial.tile_point_join_mercator(
            sf, CFG
        ),
        # the conic sibling: same mm-floor discipline through pow()
        "tile_point_join_lcc": lambda sf: spatial.tile_point_join_lcc(sf, CFG),
        "tile_point_join_shuffle": lambda sf: spatial.tile_point_join_shuffle(sf, CFG),
        "tile_clip_join": lambda sf: spatial.tile_clip_join(sf, CFG),
        "tile_clip_join_overlap": lambda sf: spatial.tile_clip_join_overlap(
            sf, OVERLAP_CFG
        ),
        "polygon_clip_join": lambda sf: spatial.polygon_clip_join(sf, CFG),
        "multiring_clip_join": lambda sf: spatial.multiring_clip_join(sf, CFG),
        # real file-backed raster window read (S2): deterministic
        # GeoTIFF fixture written to /tmp, windowed Datasource read
        "raster_windows": geotiff.raster_windows,
        # two-raster map algebra: aligned windowed band math
        "raster_algebra": geotiff.raster_algebra,
        # zonal statistics: raster x vector per-zone pixel aggregates
        "zonal_stats": geotiff.zonal_stats,
        "wkb_roundtrip": lambda sf: spatial.wkb_roundtrip(sf, CFG),
        "wkt_roundtrip": lambda sf: spatial.wkt_roundtrip(sf, CFG),
        "geojson_roundtrip": lambda sf: spatial.geojson_roundtrip(sf, CFG),
        "shapefile_roundtrip": lambda sf: spatial.shapefile_roundtrip(sf, CFG),
        # type-8 multipoint records + .prj CRS sidecar round trip
        "multipoint_roundtrip": lambda sf: spatial.multipoint_roundtrip(sf, CFG),
        "tiles_intersecting": lambda sf: spatial.tiles_intersecting(sf, CFG),
        "utm_reproject": lambda sf: spatial.utm_reproject(sf, CFG),
        # closed-form Lambert conformal conic (state-plane family) and
        # north polar stereographic — the arbitrary-CRS raster gap
        "lcc_reproject": lambda sf: spatial.lcc_reproject(sf, CFG),
        "pstereo_reproject": lambda sf: spatial.pstereo_reproject(sf, CFG),
        "utm_footprint_area": lambda sf: spatial.utm_footprint_area(sf, CFG),
        # exact spherical (geodesic) footprint area, no projection
        "footprint_area_sphere": lambda sf: spatial.footprint_area_sphere(sf, CFG),
        "tile_clip_join_metric": lambda sf: spatial.tile_clip_join_metric(sf, CFG),
        # dist_m is engine-internal: numpy vs DuckDB libm differ ~1e-10,
        # which never flips ranks here but would fail the value hash.
        "knn": lambda sf: spatial.knn_pipeline(sf, CFG, method="brute")
        .select_columns(["query_id", "rank", "neighbor_id"]),
        "knn_kring": lambda sf: spatial.knn_pipeline(sf, CFG, method="kring")
        .select_columns(["query_id", "rank", "neighbor_id"]),
        "dbscan_cells": lambda sf: spatial.dbscan_cells(sf, CFG),
        "line_cells": lambda sf: spatial.line_cells(sf, CFG),
        "focal_stats": lambda sf: spatial.focal_stats(sf, CFG),
        "corridor_join": lambda sf: spatial.corridor_join(sf, CFG),
        "corridor_join_shp": lambda sf: spatial.corridor_join_shp(sf, CFG),
        "embed_quantize": embeddings.embed_quantize,
        "winsorized_mean": relational.winsorized_mean,
        "source_overlap": text.source_overlap,
        "trending_tokens": lambda sf: text.trending_tokens(sf, CFG),
        "heatmap_geotiff": lambda sf: multimodal.heatmap_geotiff(sf, CFG),
        "token_drift": text.token_drift,
        "embed_top_components": embeddings.embed_top_components,
        "tile_occupancy_hist": lambda sf: spatial.tile_occupancy_hist(sf, CFG),
        "host_reciprocity": linkgraph.host_reciprocity,
        "curation_pipeline": text.curation_pipeline,
        "k_anonymity": text.k_anonymity,
        # l-diversity: sensitive-attribute homogeneity audit
        "l_diversity": text.l_diversity,
        "ip_range_join": relational.ip_range_join,
        "bootstrap_mean": relational.bootstrap_mean,
        "funnel_latency": relational.funnel_latency,
        # rows-only: iterative peeling (data-dependent rounds) is not
        # SQL-expressible; exact brute-peel parity in pytest
        "kcore": cluster.kcore,
        "degree_assortativity": cluster.degree_assortativity,
        "embed_truncate_audit": embeddings.embed_truncate_audit,
        "audio_resample": lambda sf: multimodal.audio_resample(sf, CFG),
        "video_scene_cuts": lambda sf: multimodal.video_scene_cuts(sf, CFG),
        "raster_equalize": lambda sf: multimodal.raster_equalize(sf, CFG),
        # overview (pyramid level) build: 2x box downsample -> real GeoTIFF
        "raster_downsample": lambda sf: multimodal.raster_downsample(sf, CFG),
        # -- relational (joins / aggregates / windows) --
        "q1_pricing": relational.q1_pricing_summary,
        "region_revenue": relational.region_revenue,
        "top_orders": relational.top_orders,
        "semi_join": relational.semi_join_orders_with_lineitems,
        "anti_join": relational.anti_join_customers_without_orders,
        "dense_ids": relational.dense_category_ids,
        "concat_remap": relational.concat_remap,
        "roboflow_concat": relational.roboflow_concat,
        "events_window": relational.events_window,
        # rows-between moving window (completes the window family)
        "events_moving_avg": relational.events_moving_avg,
        "events_time_window": relational.events_time_window,
        "lang_heavy_hitters": text.lang_heavy_hitters,
        # rows-only: BPE merge application is not SQL-expressible;
        # exact parity vs a pure-Python reference in pytest
        "bpe_encode": text.bpe_encode,
        "token_diversity": text.token_diversity,
        # ordered step conversion (view -> click -> purchase) per user
        "events_funnel": relational.events_funnel,
        # window-over-window distinct-user retention
        "events_retention": relational.events_retention,
        # first-seen reduction -> per-window new users + running total
        "events_new_users": relational.events_new_users,
        # grouped lag over an aggregated series (YoY deltas)
        "customer_yoy": relational.customer_yoy,
        # running cumulative window (unbounded frame + distinct types)
        "events_cumulative": relational.events_cumulative,
        # grouped mode/argmax: most frequent event type per user
        "user_top_type": relational.user_top_type,
        # first-order Markov transition table over user streams
        "event_transitions": relational.event_transitions,
        # left outer join via tagged narrow union (completes joins)
        "left_outer_join": relational.left_outer_join,
        "events_hopping": relational.events_hopping_window,
        # exact distinct users per hopping window (non-decomposable)
        "events_sliding_distinct": relational.events_sliding_distinct,
        # watermark/late-data tumbling window (streaming semantics)
        "events_late_window": relational.events_late_window,
        # gaps-and-islands interval merge per user
        "user_activity_islands": relational.user_activity_islands,
        "events_sessionize": relational.events_sessionize,
        "events_asof": relational.events_asof,
        "events_range_join": relational.events_range_join,
        # exact distributed row_number (histogram offsets, no sort)
        "global_rank": relational.global_rank,
        # bloom-prefiltered exact semi-join (8 KiB broadcast filter)
        "bloom_semi_join": relational.bloom_semi_join,
        "quantiles": relational.quantiles,
        # robust dispersion: exact median + median absolute deviation
        "mad": relational.mad,
        "grouped_quantiles": relational.grouped_quantiles,
        # per-group robust outlier threshold, one pass (bounded domain)
        "grouped_mad": relational.grouped_mad,
        # DDSketch-style mergeable quantiles (approx-by-construction ->
        # rows-only; error bound + associativity pytest-gated)
        "sketch_quantiles": relational.sketch_quantiles,
        "top_docs_per_lang": relational.top_docs_per_lang,
        "q6_filter_agg": relational.q6_filter_aggregate,
        "distinct_sources": relational.distinct_sources,
        # -- text / dedup --
        "token_stats": text.token_stats,
        # keyword-taxonomy topic router (broadcast dictionary argmax)
        "topic_tag": text.topic_tag,
        # zlib compressibility quality signal (rows-only: no SQL deflate)
        "compression_ratio": text.compression_ratio,
        "lang_stats": text.lang_stats,
        "dedup_exact": text.dedup_exact,
        "segment_dedup": text.segment_dedup,
        # overlapping token-window chunking (RAG prep): byte-exact
        # chunk strings, row-local explode, zero shuffle
        "chunk_windows": text.chunk_windows,
        # segment dedup that emits the CLEANED text bytes (Lee et al.
        # 2022 shape); byte-exact clean_text vs string_agg oracle
        "dedup_clean_text": text.dedup_clean_text,
        # same semantics through a shared mutable index (sharded
        # actors) — the incremental-ingest mechanism
        "streaming_dedup": text.streaming_dedup,
        "jaccard_pairs": text.jaccard_pairs,
        "jaccard_capped": lambda sf: text.jaccard_pairs(sf, max_df=400),
        "quality_filter": text.quality_filter,
        "host_stats": lambda sf: text.host_stats(sf, CFG),
        # html -> text extraction (north-rule byte-identical invariant:
        # oracle pins the extraction to the source text column per url)
        "html_extract": lambda sf: extract.html_extract(sf, CFG),
        # email/phone/IPv4 count + redaction (RE2 both sides)
        "pii_redact": extract.pii_redact,
        # URL canonicalization (strip fragment/port/tracking, lowercase
        # host) + crawl dedup by canonical url
        "url_canonical": extract.url_canonical,
        "url_dedup": extract.url_dedup,
        # JSONL interchange sink+source round trip (sources/jsonl.py)
        "jsonl_roundtrip": extract.jsonl_roundtrip,
        "ipc_roundtrip": extract.ipc_roundtrip,
        # Apache ORC sink + source (warehouse-native columnar shards)
        "orc_roundtrip": extract.orc_roundtrip,
        # Apache Avro OCF sink + source (first-party codec, sources/avro.py)
        "avro_roundtrip": extract.avro_roundtrip,
        # WARC crawl-archive sink+source round trip (sources/warc.py)
        "warc_roundtrip": lambda sf: extract.warc_roundtrip(sf, CFG),
        "csv_roundtrip": extract.csv_roundtrip,
        # TFRecord (training-export) sink+source, CRC32C-verified
        "tfrecord_roundtrip": extract.tfrecord_roundtrip,
        "warc_gz_roundtrip": lambda sf: extract.warc_gz_roundtrip(sf, CFG),
        # link graph: anchor extraction -> host degrees -> fixed-point
        # PageRank (broadcast-vector folds, hot host by construction)
        "link_extract": linkgraph.link_extract,
        # robots.txt-style prefix disallow gate (broadcast rule filter)
        "robots_filter": linkgraph.robots_filter,
        "host_degree": linkgraph.host_degree,
        # deterministic synchronous label-propagation communities
        "lpa_communities": lambda sf: linkgraph.lpa_communities(sf),
        # TrustRank-style seed-teleport PageRank
        "pagerank_personalized": lambda sf: linkgraph.pagerank_personalized(sf),
        "pagerank_hosts": linkgraph.pagerank_hosts,
        # HITS hubs/authorities (unnormalized integer-exact rounds)
        "hits_hosts": lambda sf: linkgraph.hits_hosts(sf),
        # BFS hop distances from the seed host (broadcast frontier)
        "host_bfs": linkgraph.host_bfs,
        "host_cocitation": linkgraph.host_cocitation,
        # link prediction: integer-exact Jaccard over out-neighbour sets
        "host_jaccard": linkgraph.host_jaccard,
        # bounded Bellman-Ford cheapest paths from the seed host
        "host_shortest_path": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_shortest_path(sf)
        ),
        # bit-parallel all-pairs BFS: closeness/harmonic/eccentricity
        "host_closeness": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_closeness(sf)
        ),
        # landmark closeness: L x |hosts| memory instead of hosts^2 —
        # the 10^8-host scale path, exact and SQL-checked on the
        # restricted quantity (round-5 scale-proofing, not a new
        # 64-host toy metric)
        "host_closeness_landmarks": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_closeness_landmarks(sf)
        ),
        # strongly connected components of the strong-edge subgraph
        "host_scc": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_scc(sf)
        ),
        # deterministic DeepWalk corpus: hash-indexed walks per page
        "random_walks": linkgraph.random_walks,
        # weighted variant: transition probability ~ link count
        "random_walks_weighted": linkgraph.random_walks_weighted,
        # skip-gram (center, context) pair counts from the walks
        "walk_skipgrams": linkgraph.walk_skipgrams,
        # Kendall tau between the two centrality rankers
        "kendall_tau": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.kendall_tau(sf)
        ),
        # rich-club coefficient profile of the host graph
        "rich_club": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.rich_club(sf)
        ),
        # Spearman agreement between the two centrality rankers
        "rank_correlation": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.rank_correlation(sf)
        ),
        # reciprocal-rank fusion of PageRank + Katz rankings
        "host_rank_fusion": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_rank_fusion(sf)
        ),
        # node2vec second-order biased walks (integer p/q bias)
        "node2vec_walks": linkgraph.node2vec_walks,
        # targeted-attack robustness: giant size vs removed hubs
        "host_attack_curve": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_attack_curve(sf)
        ),
        # bond-percolation robustness curve of the host graph
        "host_percolation": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_percolation(sf)
        ),
        # Luby maximal independent set, deterministic priorities
        "host_mis": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_mis(sf)
        ),
        # maximum spanning backbone (Boruvka, broadcast-fold rounds)
        "host_backbone": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_backbone(sf)
        ),
        # directed triad census: feed-forward vs cyclic motifs
        "host_triads": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_triads(sf)
        ),
        # Newman modularity terms of the LPA partition
        "lpa_modularity": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.lpa_modularity(sf)
        ),
        # SimRank pair similarity (integer fixed point)
        "host_simrank": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_simrank(sf)
        ),
        # hop plot: pairwise distance distribution + effective diameter
        "host_hopplot": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_hopplot(sf)
        ),
        # Katz centrality: attenuated bounded-length walk counts
        "host_katz": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_katz(sf)
        ),
        # GraphSAGE-style 1/2-hop neighbourhood feature aggregation
        "host_neighborhood_agg": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_neighborhood_agg(sf)
        ),
        # full k-core decomposition (rows-only; pytest peeling oracle)
        "host_coreness": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_coreness(sf)
        ),
        # temporal earliest-arrival reachability over the contact stream
        "host_temporal_reach": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_temporal_reach(sf)
        ),
        # stress centrality: integer shortest-path counts through v
        "host_stress": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_stress(sf)
        ),
        # max-bottleneck (widest) paths from the seed host
        "host_widest_path": lambda sf: __import__("ray").data.from_arrow(
            linkgraph.host_widest_path(sf)
        ),
        "regex_tokens": text.regex_tokens,
        # vowel-run syllable proxy: words/syllables/polysyllable share
        "readability": text.readability,
        # TextRank keyword scores: bucketed PageRank over the token graph
        "textrank": text.textrank,
        # KWIC concordance: query token with immediate context
        "kwic": text.kwic,
        # KMV bottom-k distinct sketch (mergeable, sample-bearing)
        "kmv_distinct": text.kmv_distinct_tokens,
        # corpus hapax-legomena share per source (vocabulary-proof)
        "hapax": text.hapax,
        # lang x source chi-square independence audit (integer e2)
        "chi2_lang_source": text.chi2_lang_source,
        # Gini inequality of doc lengths per source (integer e6)
        "length_gini": text.length_gini,
        "sample_hash": text.sample_hash,
        # length-weighted deterministic Bernoulli sample
        "weighted_sample": text.weighted_sample,
        # exact edit-distance<=1 pairs (deletion-neighborhood banding)
        "editdist_pairs": text.editdist_pairs,
        # grouped integer-exact correlation moments
        "lang_moments": text.lang_moments,
        # doc-level co-occurrence counts (PMI numerators, fixed vocab)
        "cooccur_pairs": text.cooccur_pairs,
        # integer-exact per-lang z-score filter (composes moments)
        "zscore_outliers": text.zscore_outliers,
        # PPJoin prefix-filtered EXACT Jaccard join (uncapped)
        "ppjoin_pairs": text.ppjoin_pairs,
        "approx_distinct_tokens": text.approx_distinct_tokens,
        "kmeans": embeddings.kmeans,
        "tfidf": text.tfidf_scores,
        # DSIR importance weights (integer-exact target/raw ratio)
        "dsir_weights": text.dsir_weights,
        # BPE tokenizer TRAINING (iterative; rows-only, pytest-pinned)
        "bpe_train": text.bpe_train,
        # per-column catalog stats (n / nulls / exact ndv / min / max)
        "table_profile": text.table_profile,
        "decontaminate": text.decontaminate,
        "pack_sequences": text.pack_sequences,
        # exact top-k tokens via Count-Min pruning (no vocab groupby)
        "heavy_hitters": text.heavy_hitters,
        # per-doc first-occurrence map (C4-style intra-doc dedup key)
        "token_first_pos": text.token_first_pos,
        # positional phrase search (overlap-correct adjacency scan)
        "phrase_query": text.phrase_query,
        # Gopher repetition rules: top-bigram multiplicity + dup trigrams
        "ngram_repetition": text.ngram_repetition,
        # integer-exact BM25 retrieval ranking vs a fixed query
        "bm25_query": text.bm25_query,
        # multi-level aggregate / pivot over one distributed fine pass
        "lang_rollup": text.lang_rollup,
        "lang_cube": text.lang_cube,
        # lift-filtered phrase mining (integer cross-multiplied PMI)
        "collocations": text.collocations,
        "lang_pivot": text.lang_pivot,
        # UNPIVOT/melt: inverse reshape of lang_pivot
        "lang_unpivot": text.lang_unpivot,
        # deterministic per-lang stratified sample
        "group_sample": text.group_sample,
        "dup_clusters": cluster.dup_clusters,
        "near_dedup": cluster.near_dedup,
        # degree-oriented distributed triangle counting (dup cliques)
        "triangle_count": cluster.triangle_count,
        "minhash_lsh": text.minhash_lsh_pairs,
        "simhash": text.simhash_fingerprints,
        # exact hamming<=D near-dup pairs (banded pigeonhole + verify)
        "simhash_pairs": text.simhash_pairs,
        # exact percentile cut, histogram + streaming filter (no sort)
        "quality_percentile_filter": text.quality_percentile_filter,
        # integer-exact n-gram LM scoring shape (tfidf-pattern shuffle)
        "bigram_score": text.bigram_score,
        "rolling_fingerprint": text.rolling_fingerprint,
        # cross-doc repeated-substring detection on the winnowing sample
        "shared_fingerprints": text.shared_fingerprints,
        # MAD-based robust length anomaly filter
        "length_outliers": text.length_outliers,
        "langid": text.langid_scores,
        # langid eval: confusion matrix vs the labeled lang column
        "langid_confusion": text.langid_confusion,
        # -- similarity search / embeddings --
        "ann_brute": embeddings.ann_brute,
        # contrastive hard-negative mining (top-1 other-label cosine)
        "hard_negatives": embeddings.hard_negatives,
        "ann_lsh": embeddings.ann_lsh,
        # shuffle-partitioned ANN (no broadcast index): rows-only,
        # recall vs ann_brute asserted in tests/test_embeddings.py
        "ann_ivf": embeddings.ann_ivf,
        # product-quantization ANN (64x-compressed index + ADC +
        # exact re-rank): rows-only, recall gated in tests
        "ann_pq": embeddings.ann_pq,
        # recall@K audit of every approximate index vs brute (rows-only)
        "ann_recall_report": embeddings.ann_recall_report,
        "embed_dup": embeddings.embed_dup,
        # exact all-pairs dup test as a distributed block-nested-loop
        # join — no broadcast embedding index (same oracle as embed_dup)
        "embed_dup_sharded": embeddings.embed_dup_sharded,
        # SemDeDup (arXiv:2303.09540): cluster-scoped semantic dedup,
        # keep-the-least-prototypical drop rule, fixed-point exact
        "semdedup": embeddings.semdedup,
        # the 10^12-row SemDeDup plan: one groupby(cluster) shuffle
        # co-locates each cluster, chunked per-group pair matmuls —
        # no broadcast embedding index (same oracle as semdedup)
        "semdedup_sharded": embeddings.semdedup_sharded,
        # perceptual image dedup: real PNG decode -> integer-exact
        # dHash; pairs via pigeonhole banding (no all-pairs)
        "image_phash": lambda sf: multimodal.image_phash(sf, CFG),
        # Sobel edge statistics over real PNG decode (integer-exact)
        "image_edges": lambda sf: multimodal.image_edges(sf, CFG),
        "phash_pairs": lambda sf: multimodal.phash_pairs(sf, CFG),
        # audio signal features over the real RIFF decode path
        "audio_zcr": lambda sf: multimodal.audio_zcr(sf, CFG),
        # STFT band energies (batched rfft; rows-only — FFT is not
        # SQL-expressible; numpy-recompute + Parseval pytest oracle)
        "audio_spectrogram": lambda sf: multimodal.audio_spectrogram(sf, CFG),
        # greedy k-center coreset (iterative, data-dependent):
        # rows-only; exact numpy-greedy parity in tests/test_embeddings.py
        "kcenter_coreset": lambda sf: embeddings.kcenter_coreset(sf),
        # per-iteration checkpointed kmeans (fresh ckpt dir per call;
        # crash/resume semantics in tests/test_embeddings.py)
        "kmeans_resumable": lambda sf: embeddings.kmeans_resumable(
            sf, __import__("tempfile").mkdtemp(prefix="aerial_kmeans_ck_")
        ),
        # cosine-to-own-centroid outlier sweep (exact fixed-point)
        "embed_outliers": embeddings.embed_outliers,
        "label_centroids": embeddings.label_centroids,
        # -- reverse path (coco2geojson analog) --
        "spatialize": lambda sf: vectorize.spatialize(sf, CFG),
        "segmentation_spatialize": lambda sf: vectorize.segmentation_spatialize(
            sf, CFG
        ),
        "marginal_flags": lambda sf: vectorize.marginal_flags(sf, CFG),
        "zone_envelope": lambda sf: vectorize.zone_envelope(sf, CFG),
        "zone_merge": lambda sf: vectorize.zone_merge(sf, CFG),
        # areal interpolation: zone mass -> tile grid, overlap-weighted
        "areal_interp": lambda sf: vectorize.areal_interp(sf, CFG),
        # marginal-aware merge routing (coco2geojson.py:41-101 analog):
        # rows-only; exact numpy oracle in tests/test_new_ops.py
        "zone_merge_routed": lambda sf: vectorize.zone_merge_routed(sf, CFG),
        "regularise": lambda sf: vectorize.regularise(sf, CFG),
        # -- COCO assembly (dense IDs / validator / split / balance) --
        "coco_images": lambda sf: coco.coco_images(sf, CFG),
        "coco_categories": lambda sf: coco.coco_categories(sf, CFG),
        "coco_annotations": lambda sf: coco.coco_annotations(sf, CFG),
        "coco_roundtrip": lambda sf: coco.coco_roundtrip(sf, CFG),
        "coco_validate": lambda sf: coco.coco_validate(sf, CFG),
        "coco_split": lambda sf: coco.coco_split(sf, CFG),
        "stratified_split": lambda sf: coco.stratified_split(sf, CFG),
        # multi-label ITERATIVE stratification (Sechidis block closed
        # form): iterative/data-dependent -> rows-only; determinism +
        # balance-beats-hash asserted in tests/test_round3_ops.py
        "iter_stratified_split": lambda sf: coco.iter_stratified_split(sf, CFG),
        # exact per-sample Sechidis greedy (the reference's
        # skmultilearn algorithm); gated driver loop, rows-only
        "iter_stratified_split_exact": lambda sf: coco.iter_stratified_split_exact(
            sf, CFG
        ),
        "singleton_drop": lambda sf: coco.drop_small_classes(sf, CFG),
        "class_stats": lambda sf: coco.class_stats(sf, CFG),
        "balance_removal": lambda sf: coco.balance_removal(sf, CFG),
        "isolate_cat": lambda sf: coco.isolate_cat(sf, CFG),
        # -- lineage / checkpoint-resume --
        "lineage_write": _lineage_write,
        # -- multimodal (binary payload plumbing; codec stubbed) --
        "media_meta": lambda sf: multimodal.media_meta(sf, CFG),
        # REAL PNG decode (first-party codec; upgraded from the stub)
        "media_decode": lambda sf: multimodal.media_decode(sf, CFG),
        # the byte-stats stub path stays as its own entry (audio/video
        # codecs remain honestly stubbed)
        "media_byte_stats": lambda sf: multimodal.decode_stub(sf, CFG),
        "frame_sample": lambda sf: multimodal.frame_sample(sf, CFG),
        # S8: PNG + bounds -> real georeferenced GeoTIFF -> read-back
        "png_to_geotiff": lambda sf: multimodal.png_to_geotiff(sf, CFG),
        "jpeg_decode": lambda sf: multimodal.jpeg_decode(sf, CFG),
        "jpeg_to_geotiff": lambda sf: multimodal.jpeg_to_geotiff(sf, CFG),
        # real WAV decode (first-party RIFF/PCM16 codec)
        "audio_decode": lambda sf: multimodal.audio_decode(sf, CFG),
        # real frame sampling (first-party container + PNG frames)
        "video_frames": lambda sf: multimodal.video_frames(sf, CFG),
        # REAL decoded-pixel features (upgraded from the byte-histogram
        # stub): first-party PNG decode -> 16-bin intensity histogram +
        # exact moments, SQL-mirrored via the closed-form pixel synth
        "media_embed": lambda sf: multimodal.media_embed(sf, CFG),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "geocode": sql_oracle.geocode_sql(CFG),
        "cell_index": sql_oracle.cell_index_sql(CFG),
        "cell_compact": sql_oracle.cell_compact_sql(CFG),
        "skyline": relational.SKYLINE_SQL,
        "grouped_ols": text.GROUPED_OLS_SQL,
        "attribution_last_touch": relational.ATTRIBUTION_SQL,
        "table_diff": relational.TABLE_DIFF_SQL,
        "upsert_apply": relational.UPSERT_APPLY_SQL,
        "scd_intervals": relational.SCD_INTERVALS_SQL,
        "nearest_facility": spatial.nearest_facility_sql(),
        "knn_join": spatial.knn_join_sql(),
        "lang_rank": text.LANG_RANK_SQL,
        "lang_sources_agg": text.LANG_SOURCES_AGG_SQL,
        "suffix_dedup": text.SUFFIX_DEDUP_SQL,
        "ntile_lang": text.NTILE_LANG_SQL,
        "geohash_index": spatial.geohash_index_sql(),
        "within_dist_join": spatial.within_dist_join_sql(),
        "cell_pyramid": spatial.cell_pyramid_sql(),
        "moran_i": spatial.moran_i_sql(),
        "cell_blobs": spatial.cell_blobs_sql(),
        "segment_crossings": spatial.segment_crossings_sql(),
        "idw_fill": spatial.idw_fill_sql(),
        "tile_mode_lang": spatial.tile_mode_lang_sql(),
        "contour_segments": spatial.contour_segments_sql(CFG),
        "contour_rings": spatial.contour_rings_sql(CFG),
        "spatial_split": spatial.spatial_split_sql(CFG),
        "shapefile_zone_join": spatial.shapefile_zone_join_sql(),
        "embed_gram": embeddings.embed_gram_sql(),
        "full_outer_join": relational.FULL_OUTER_JOIN_SQL,
        "inverted_index": text.INVERTED_INDEX_SQL,
        "text_normalize": text.TEXT_NORMALIZE_SQL,
        "q3_shipping": relational.Q3_SHIPPING_SQL,
        "delta_lang_counts": text.delta_lang_counts_sql(),
        "split_leakage": text.split_leakage_sql(),
        "temperature_sample": text.TEMPERATURE_SAMPLE_SQL,
        "crawl_path": spatial.crawl_path_sql(),
        "reproject": sql_oracle.reproject_sql(CFG),
        "tile_point_join": sql_oracle.tile_point_join_sql(CFG),
        "tile_point_join_mercator": sql_oracle.tile_point_join_mercator_sql(CFG),
        "tile_point_join_lcc": sql_oracle.tile_point_join_lcc_sql(CFG),
        # salted-shuffle plan: same semantics, same oracle
        "tile_point_join_shuffle": sql_oracle.tile_point_join_sql(CFG),
        "tile_clip_join": sql_oracle.tile_clip_join_sql(CFG),
        "tile_clip_join_overlap": sql_oracle.tile_clip_join_overlap_sql(OVERLAP_CFG),
        "polygon_clip_join": sql_oracle.polygon_clip_join_sql(CFG),
        "multiring_clip_join": sql_oracle.multiring_clip_join_sql(CFG),
        "raster_windows": geotiff.RASTER_WINDOWS_SQL,
        "raster_algebra": geotiff.RASTER_ALGEBRA_SQL,
        "zonal_stats": geotiff.ZONAL_STATS_SQL,
        "wkb_roundtrip": sql_oracle.wkb_roundtrip_sql(CFG),
        "wkt_roundtrip": sql_oracle.wkb_roundtrip_sql(CFG),
        "geojson_roundtrip": sql_oracle.geojson_roundtrip_sql(CFG),
        # shapefile write->read is the identity on the same columns
        "shapefile_roundtrip": sql_oracle.geojson_roundtrip_sql(CFG),
        "multipoint_roundtrip": sql_oracle.multipoint_roundtrip_sql(CFG),
        "tiles_intersecting": spatial.tiles_intersecting_sql(CFG),
        "utm_reproject": sql_oracle.utm_reproject_sql(CFG),
        "lcc_reproject": sql_oracle.lcc_reproject_sql(CFG),
        "pstereo_reproject": sql_oracle.pstereo_reproject_sql(CFG),
        "utm_footprint_area": sql_oracle.utm_footprint_area_sql(CFG),
        "footprint_area_sphere": spatial.footprint_area_sphere_sql(CFG),
        "tile_clip_join_metric": sql_oracle.tile_clip_join_metric_sql(CFG),
        "knn": sql_oracle.knn_sql(CFG),
        # knn_kring is EXACT (adaptive ring expansion with a provable
        # coverage-radius stopping rule) — same oracle as brute kNN.
        "knn_kring": sql_oracle.knn_sql(CFG),
        "dbscan_cells": sql_oracle.dbscan_cells_sql(CFG),
        "line_cells": sql_oracle.line_cells_sql(CFG),
        "focal_stats": sql_oracle.focal_stats_sql(CFG),
        "corridor_join": sql_oracle.corridor_join_sql(CFG),
        # same oracle as corridor_join: route geometry round-trips the
        # polyline shapefile byte-exactly (float64 LE in both directions)
        "corridor_join_shp": sql_oracle.corridor_join_sql(CFG),
        "embed_quantize": embeddings.EMBED_QUANTIZE_SQL,
        "winsorized_mean": relational.WINSORIZED_MEAN_SQL,
        "source_overlap": text.source_overlap_sql(),
        "trending_tokens": text.trending_tokens_sql(CFG.pages_rep),
        "heatmap_geotiff": multimodal.heatmap_geotiff_sql(CFG),
        "token_drift": text.token_drift_sql(),
        "embed_top_components": embeddings.embed_top_components_sql(),
        "tile_occupancy_hist": sql_oracle.tile_occupancy_hist_sql(CFG),
        "host_reciprocity": linkgraph.host_reciprocity_sql(),
        "curation_pipeline": text.curation_pipeline_sql(),
        "k_anonymity": text.k_anonymity_sql(),
        "l_diversity": text.l_diversity_sql(),
        "ip_range_join": relational.ip_range_join_sql(CFG.pages_rep),
        "bootstrap_mean": relational.bootstrap_mean_sql(),
        "embed_truncate_audit": embeddings.embed_truncate_audit_sql(),
        "funnel_latency": relational.FUNNEL_LATENCY_SQL,
        "degree_assortativity": cluster.degree_assortativity_sql(),
        "audio_resample": multimodal.audio_resample_sql(CFG),
        "video_scene_cuts": multimodal.video_scene_cuts_sql(CFG),
        "raster_equalize": multimodal.raster_equalize_sql(CFG),
        "raster_downsample": multimodal.raster_downsample_sql(CFG),
        "q1_pricing": relational.Q1_SQL,
        "region_revenue": relational.REGION_REVENUE_SQL,
        "top_orders": relational.top_orders_sql(),
        "semi_join": relational.SEMI_JOIN_SQL,
        "anti_join": relational.ANTI_JOIN_SQL,
        "dense_ids": relational.dense_category_ids_sql(),
        "concat_remap": relational.CONCAT_REMAP_SQL,
        "roboflow_concat": relational.ROBOFLOW_CONCAT_SQL,
        "events_window": relational.EVENTS_WINDOW_SQL,
        "events_moving_avg": relational.events_moving_avg_sql(),
        "events_time_window": relational.events_time_window_sql(),
        "lang_heavy_hitters": text.lang_heavy_hitters_sql(),
        "token_diversity": text.TOKEN_DIVERSITY_SQL,
        "events_funnel": relational.events_funnel_sql(),
        "events_retention": relational.events_retention_sql(),
        "events_new_users": relational.events_new_users_sql(),
        "customer_yoy": relational.CUSTOMER_YOY_SQL,
        "events_cumulative": relational.EVENTS_CUMULATIVE_SQL,
        "user_top_type": relational.USER_TOP_TYPE_SQL,
        "event_transitions": relational.EVENT_TRANSITIONS_SQL,
        "left_outer_join": relational.LEFT_OUTER_JOIN_SQL,
        "events_hopping": relational.EVENTS_HOPPING_SQL,
        "events_sliding_distinct": relational.events_sliding_distinct_sql(),
        "events_late_window": relational.events_late_window_sql(),
        "user_activity_islands": relational.user_activity_islands_sql(),
        "events_sessionize": relational.EVENTS_SESSIONIZE_SQL,
        "events_asof": relational.events_asof_sql(),
        "events_range_join": relational.events_range_join_sql(),
        "global_rank": relational.GLOBAL_RANK_SQL,
        "bloom_semi_join": relational.BLOOM_SEMI_JOIN_SQL,
        "quantiles": relational.QUANTILES_SQL,
        "mad": relational.MAD_SQL,
        "grouped_quantiles": relational.GROUPED_QUANTILES_SQL,
        "grouped_mad": relational.GROUPED_MAD_SQL,
        "top_docs_per_lang": relational.top_docs_per_lang_sql(),
        "q6_filter_agg": relational.Q6_SQL,
        "distinct_sources": relational.DISTINCT_SQL,
        "token_stats": text.TOKEN_STATS_SQL,
        "topic_tag": text.topic_tag_sql(),
        "lang_stats": text.LANG_STATS_SQL,
        "dedup_exact": text.DEDUP_EXACT_SQL,
        "segment_dedup": text.SEGMENT_DEDUP_SQL,
        "chunk_windows": text.chunk_windows_sql(),
        "dedup_clean_text": text.DEDUP_CLEAN_TEXT_SQL,
        "streaming_dedup": text.DEDUP_EXACT_SQL,
        "jaccard_pairs": text.jaccard_pairs_sql(),
        "jaccard_capped": text.jaccard_pairs_sql(max_df=400),
        "quality_filter": text.QUALITY_FILTER_SQL,
        "host_stats": text.host_stats_sql(CFG),
        "html_extract": extract.html_extract_sql(CFG),
        "pii_redact": extract.pii_redact_sql(),
        "url_canonical": extract.url_canonical_sql(),
        "url_dedup": extract.url_dedup_sql(),
        "jsonl_roundtrip": extract.JSONL_ROUNDTRIP_SQL,
        "ipc_roundtrip": extract.JSONL_ROUNDTRIP_SQL,
        "orc_roundtrip": extract.ORC_ROUNDTRIP_SQL,
        "avro_roundtrip": extract.AVRO_ROUNDTRIP_SQL,
        "warc_roundtrip": extract.warc_roundtrip_sql(CFG),
        "csv_roundtrip": extract.CSV_ROUNDTRIP_SQL,
        "tfrecord_roundtrip": extract.TFRECORD_ROUNDTRIP_SQL,
        "warc_gz_roundtrip": extract.warc_roundtrip_sql(CFG),
        "link_extract": linkgraph.link_extract_sql(),
        "robots_filter": linkgraph.robots_filter_sql(),
        "host_degree": linkgraph.host_degree_sql(),
        "lpa_communities": linkgraph.lpa_communities_sql(),
        "pagerank_personalized": linkgraph.pagerank_personalized_sql(),
        "pagerank_hosts": linkgraph.pagerank_hosts_sql(),
        "hits_hosts": linkgraph.hits_hosts_sql(),
        "host_bfs": linkgraph.host_bfs_sql(),
        "host_cocitation": linkgraph.host_cocitation_sql(),
        "host_jaccard": linkgraph.host_jaccard_sql(),
        "host_shortest_path": linkgraph.host_shortest_path_sql(),
        "host_closeness": linkgraph.host_closeness_sql(),
        "host_closeness_landmarks": linkgraph.host_closeness_landmarks_sql(),
        "host_scc": linkgraph.host_scc_sql(),
        "random_walks": linkgraph.random_walks_sql(),
        "random_walks_weighted": linkgraph.random_walks_weighted_sql(),
        "walk_skipgrams": linkgraph.walk_skipgrams_sql(),
        "host_percolation": linkgraph.host_percolation_sql(),
        "host_attack_curve": linkgraph.host_attack_curve_sql(),
        "node2vec_walks": linkgraph.node2vec_walks_sql(),
        "host_rank_fusion": linkgraph.host_rank_fusion_sql(),
        "rank_correlation": linkgraph.rank_correlation_sql(),
        "kendall_tau": linkgraph.kendall_tau_sql(),
        "rich_club": linkgraph.rich_club_sql(),
        "host_mis": linkgraph.host_mis_sql(),
        "host_backbone": linkgraph.host_backbone_sql(),
        "host_stress": linkgraph.host_stress_sql(),
        "host_temporal_reach": linkgraph.host_temporal_reach_sql(),
        "host_neighborhood_agg": linkgraph.host_neighborhood_agg_sql(),
        "host_katz": linkgraph.host_katz_sql(),
        "host_hopplot": linkgraph.host_hopplot_sql(),
        "host_simrank": linkgraph.host_simrank_sql(),
        "lpa_modularity": linkgraph.lpa_modularity_sql(),
        "host_triads": linkgraph.host_triads_sql(),
        "trajectory_hausdorff": spatial.trajectory_hausdorff_sql(CFG),
        "tile_skew": spatial.tile_skew_sql(CFG),
        "jl_projection_audit": embeddings.jl_projection_audit_sql(),
        "embed_drift": embeddings.embed_drift_sql(),
        "host_widest_path": linkgraph.host_widest_path_sql(),
        "regex_tokens": text.REGEX_TOKENS_SQL,
        "readability": text.READABILITY_SQL,
        "kwic": text.kwic_sql(),
        "textrank": text.textrank_sql(),
        "hapax": text.HAPAX_SQL,
        "chi2_lang_source": text.CHI2_LANG_SOURCE_SQL,
        "length_gini": text.LENGTH_GINI_SQL,
        "sample_hash": text.sample_hash_sql(),
        "weighted_sample": text.weighted_sample_sql(),
        "editdist_pairs": text.EDITDIST_PAIRS_SQL,
        "lang_moments": text.LANG_MOMENTS_SQL,
        "cooccur_pairs": text.COOCCUR_PAIRS_SQL,
        "zscore_outliers": text.zscore_outliers_sql(),
        "ppjoin_pairs": text.jaccard_pairs_sql(threshold=0.5, max_df=None),
        "tfidf": text.TFIDF_SQL,
        "dsir_weights": text.DSIR_SQL,
        "table_profile": text.TABLE_PROFILE_SQL,
        "decontaminate": text.decontaminate_sql(),
        "pack_sequences": text.pack_sequences_sql(),
        "heavy_hitters": text.heavy_hitters_sql(),
        "token_first_pos": text.TOKEN_FIRST_POS_SQL,
        "phrase_query": text.phrase_query_sql(),
        "ngram_repetition": text.NGRAM_REPETITION_SQL,
        "bm25_query": text.bm25_query_sql(),
        "lang_rollup": text.LANG_ROLLUP_SQL,
        "lang_cube": text.LANG_CUBE_SQL,
        "collocations": text.collocations_sql(),
        "lang_pivot": text.lang_pivot_sql(),
        "lang_unpivot": text.lang_unpivot_sql(),
        "group_sample": text.group_sample_sql(),
        "dup_clusters": cluster.dup_clusters_sql(),
        "near_dedup": cluster.near_dedup_sql(),
        "triangle_count": cluster.triangle_count_sql(),
        # minhash_lsh (band-sampled candidate family) / langid (model
        # state): non-SQL-expressible — rows-only; determinism + recall
        # asserted in tests/test_text.py.
        "simhash": text.SIMHASH_SQL,
        "simhash_pairs": text.simhash_pairs_sql(),
        "quality_percentile_filter": text.quality_percentile_filter_sql(),
        "bigram_score": text.BIGRAM_SCORE_SQL,
        "rolling_fingerprint": text.rolling_fingerprint_sql(),
        "shared_fingerprints": text.shared_fingerprints_sql(),
        "length_outliers": text.length_outliers_sql(),
        "ann_brute": embeddings.ann_brute_sql(),
        "hard_negatives": embeddings.HARD_NEGATIVES_SQL,
        "embed_dup": embeddings.embed_dup_sql(),
        "embed_dup_sharded": embeddings.embed_dup_sql(),
        "semdedup": embeddings.semdedup_sql(),
        "semdedup_sharded": embeddings.semdedup_sql(),
        "image_phash": multimodal.image_phash_sql(CFG),
        "image_edges": multimodal.image_edges_sql(CFG),
        "phash_pairs": multimodal.phash_pairs_sql(CFG),
        "audio_zcr": multimodal.audio_zcr_sql(CFG),
        "label_centroids": embeddings.label_centroids_sql(),
        "embed_outliers": embeddings.embed_outliers_sql(),
        # ann_lsh: approximate scale path — rows-only; recall vs
        # ann_brute asserted in tests/test_embeddings.py.
        "spatialize": vectorize.spatialize_sql(CFG),
        "segmentation_spatialize": vectorize.segmentation_spatialize_sql(CFG),
        "marginal_flags": vectorize.marginal_flags_sql(CFG),
        "zone_envelope": vectorize.zone_envelope_sql(CFG),
        "zone_merge": vectorize.zone_merge_sql(CFG),
        "areal_interp": vectorize.areal_interp_sql(CFG),
        # zone_merge_routed (pixel-union routing) / regularise
        # (geometry kernels): rows-only; exact numpy oracles in
        # tests/test_vectorize.py + tests/test_new_ops.py.
        "coco_images": coco.coco_images_sql(CFG),
        "coco_categories": coco.coco_categories_sql(CFG),
        "coco_annotations": coco.coco_annotations_sql(CFG),
        "coco_roundtrip": coco.coco_annotations_sql(CFG),
        "coco_validate": coco.coco_validate_sql(CFG),
        "coco_split": coco.coco_split_sql(CFG),
        "stratified_split": coco.stratified_split_sql(CFG),
        "singleton_drop": coco.drop_small_classes_sql(CFG),
        "class_stats": coco.class_stats_sql(CFG),
        "balance_removal": coco.balance_removal_sql(CFG),
        "isolate_cat": coco.isolate_cat_sql(CFG),
        "lineage_write": LINEAGE_SQL.format(
            tpj=sql_oracle.tile_point_join_sql(CFG)
        ),
        "media_meta": multimodal.media_meta_sql(CFG),
        "media_decode": multimodal.media_decode_sql(CFG),
        "png_to_geotiff": multimodal.png_to_geotiff_sql(CFG),
        "jpeg_decode": multimodal.jpeg_decode_sql(CFG),
        "jpeg_to_geotiff": multimodal.jpeg_to_geotiff_sql(CFG),
        "audio_decode": multimodal.audio_decode_sql(CFG),
        "video_frames": multimodal.video_frames_sql(CFG),
        "media_embed": multimodal.media_embed_sql(CFG),
        "media_byte_stats": multimodal.media_byte_stats_sql(CFG),
        # frame_sample: deterministic codec stub — rows-only; numpy
        # oracle in tests/test_multimodal.py.
    }
