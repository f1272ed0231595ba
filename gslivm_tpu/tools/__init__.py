"""Offline tooling parity with the reference's `python/` scripts (SURVEY
§2.5 layer L9): calibration helpers, trajectory/timing plots, rosbag
extraction, side-by-side video, NeRF-style dataset export.

Each module doubles as a CLI: `python -m gslivm_tpu.tools.<name> ...`.
"""
