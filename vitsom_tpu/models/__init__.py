"""vitsom_tpu.models"""
