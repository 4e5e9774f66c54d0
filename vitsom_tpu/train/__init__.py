"""vitsom_tpu.train"""
