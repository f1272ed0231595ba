"""Sensor-side CPU pipeline: voxel maps, ESKF odometry, dataset IO.

Decoupled from ROS (SURVEY §7 design posture): feeds poses, images, and
colored points to the device-side mapping stack.
"""
