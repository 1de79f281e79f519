#!/bin/bash
# Cycle scaling samples, weighting the under-sampled levels (t32, t2).
cd /root/repo
while true; do
  for c in 32 2 32 8 2 32; do
    python tools/scaling_hunt.py sample $c >> /tmp/hunt_loop.log 2>&1
  done
done
