"""vitsom_tpu.utils"""
