"""Streaming runtime: receiver chains (jittable IQ→audio programs),
block scheduling, drift compensation, and the latency governor."""
