"""Pure pandas/numpy reference kernels — the test oracle."""
