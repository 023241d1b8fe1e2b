"""rastertiler_rs_ray — a Ray-Data-native spatial tiling + join engine.

A from-scratch re-expression of the capabilities of
``brendan-ward/rastertiler-rs`` (reference, read-only at /root/reference)
as idiomatic Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches``
over zero-copy Arrow batches, actor pools for stateful stages, and
explicit ``groupby``/``sort`` shuffles keyed on ``(zoom, x, y)`` /
``cell_id``, generalized with an S2-style cell index, point-in-polygon,
kNN, raster↔vector joins, dedup / similarity / text-analysis operators
for large-scale training-data pipelines.

Layout:
    geo/        pure numpy tile & projection math (reference parity)
    png/        pure-Python deterministic PNG encoders
    raster/     deterministic synthetic raster + windowed NN reads
    sources/    Dataset sources (tile ids, parquet tables, doc tables)
    stages/     map_batches stage functions & actor-pool classes
    functions/  scalar/vector helpers (hashing, colors, packing)
    pipelines/  end-to-end pipelines (render, merge, joins, dedup, ...)
    state/      checkpoint manifests, lineage, metrics

No module here ever calls ``ray.init()`` — sessions are owned by the
driver / bench.py / the pytest fixture.
"""

__version__ = "0.1.0"
