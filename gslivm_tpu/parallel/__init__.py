"""Multi-chip scaling: device meshes, sharded rendering and training."""
