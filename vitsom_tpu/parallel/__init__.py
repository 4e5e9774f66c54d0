"""vitsom_tpu.parallel"""
