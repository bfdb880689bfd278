"""Pure numpy/pyarrow kernels — no Ray imports here.

Every function in this package is vectorized over numpy arrays so it can be
called inside ``Dataset.map_batches`` with zero-copy Arrow batches.
"""
