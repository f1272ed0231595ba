"""Device compute ops: rasterization, SH, covariance math, losses, voxel-GP."""
