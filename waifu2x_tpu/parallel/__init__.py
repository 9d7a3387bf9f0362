from waifu2x_tpu.parallel.tiles import TilePlan, plan_tiles, tiled_convert  # noqa: F401
