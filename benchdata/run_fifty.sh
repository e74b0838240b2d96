#!/bin/bash
# 50-sequence centromere-scale MSA measurement (BASELINE.json config 5 scale class,
# sequences at the bottom of the 100kbp-10Mbp band: 50 x ~184 kbp, 9.18 Mbp total,
# simulated with tools/sim_centromere from benchdata/anc.fasta on fifty.nwk).
# Runs ours then the reference binary on the same input, records wall/user/maxRSS.
set -u
cd "$(dirname "$0")/.."
OUT=benchdata/results_r03.json
mkdir -p /tmp/fifty_run

echo "== ours =="
/usr/bin/time -v python -m centrolign_tpu.cli -v 1 -T benchdata/fifty.nwk \
    benchdata/fifty.fasta > /tmp/fifty_run/ours.gfa 2> /tmp/fifty_run/ours.log
echo "ours rc=$?"
tail -3 /tmp/fifty_run/ours.log

echo "== reference =="
/usr/bin/time -v /tmp/refbuild/centrolign -v 1 -T benchdata/fifty.nwk \
    benchdata/fifty.fasta > /tmp/fifty_run/ref.gfa 2> /tmp/fifty_run/ref.log
echo "ref rc=$?"
tail -3 /tmp/fifty_run/ref.log

cmp -s /tmp/fifty_run/ours.gfa /tmp/fifty_run/ref.gfa && echo "GFA: byte-identical" \
    || echo "GFA: differs"
