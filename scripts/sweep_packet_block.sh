#!/bin/bash
# Sweep the packet-kernel ray block size against the yoimiya end-to-end
# bench (RAY_BLOCK is an import-time constant; each point is a process).
# NOTE: blocks 512 and 4096 hang the remote Mosaic compiler (memory:
# tpu-axon-gotchas); only 1024 and 2048 are known-safe grid constants.
for b in 1024 2048; do
  echo "=== LPT_PACKET_BLOCK=$b ==="
  LPT_PACKET_BLOCK=$b timeout 600 python bench.py --scene yoimiya 2>&1 | grep -v WARNING
done
