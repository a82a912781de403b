"""aerial_conversion_ray — a Ray-Data-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query / data-processing
capabilities of ``Sydney-Informatics-Hub/aerial-conversion``
(reference at /root/reference, read-only), re-expressed as streaming
Ray Data pipelines over Arrow batches:

- deterministic geocode of a Common-Crawl-style ``pages`` corpus
  (url, warc_ts, html, text, lang) to points + polygon footprints,
- multi-resolution grid cell index (H3/S2 analog, pure numpy),
- tile grid generation with the reference's exact rounding/overlap
  semantics (``aerial_conversion/tiles.py:16-83``),
- point-in-polygon / clip spatial joins (STRtree analog via
  grid-bucketed candidate lookup + vectorized ray casting),
- kNN (k-ring candidate expansion + haversine refine),
- rasterize / vectorize and per-zone polygon merge
  (``scripts/coco2geojson.py:104-156`` analog),
- COCO-style annotation building, dense-ID assignment, category
  dictionaries (``aerial_conversion/coco.py``,
  ``scripts/batch_geojson2coco.py:366-476`` analogs),
- dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), text
  analysis, embedding similarity search,
- per-partition lineage manifests + checkpoint resume.

Design rules (enforced throughout):
- every transform is ``Dataset.map_batches`` over zero-copy Arrow
  (``batch_format="pyarrow"``) or numpy; no per-row Python in hot
  paths;
- stateful stages (grid indexes, broadcast side tables) are callable
  classes run as actor pools, setup in ``__init__``;
- wide operations (groupby / sort) are preceded by in-batch partial
  aggregation; small join sides are broadcast via ``ray.put``;
- nothing in the library calls ``ray.init`` / ``ray.shutdown``.
"""

__version__ = "0.1.0"
