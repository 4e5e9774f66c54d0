"""vitsom_tpu.data"""
