#!/bin/bash
# sf1 scale spot-check (r7 verdict #5): superlinear-risk queries on
# sf0.1 vs a 10x synthetic blow-up. Writes tools/SCALECHECK.json.
cd /root/repo
exec sbt -batch "Test/runMain graft.ScaleCheck"
