"""vitsom_tpu.som"""
