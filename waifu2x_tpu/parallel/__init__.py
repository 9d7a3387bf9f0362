from waifu2x_tpu.parallel.tiles import TilePlan, plan_tiles, tiled_convert  # noqa: F401

# The product multi-device chain (cli --mesh / StreamConverter(mesh=...))
# lives in waifu2x_tpu.parallel.mesh_pipeline (MeshPipeline, make_mesh3,
# auto_spatial_shape); the certified single-step twins in fast_sharded.
# Both import jax eagerly, so they are not re-exported here — pipeline.py
# defers the import until a mesh is actually requested.
