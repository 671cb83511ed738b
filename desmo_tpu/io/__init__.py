"""Snapshot I/O: synthetic generators, npz/npy loaders, VTK readers."""
