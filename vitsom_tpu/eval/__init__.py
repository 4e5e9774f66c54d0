"""vitsom_tpu.eval"""
