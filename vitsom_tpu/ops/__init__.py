"""vitsom_tpu.ops"""
