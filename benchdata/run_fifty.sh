#!/bin/bash
# 50-sequence centromere-scale MSA measurement (BASELINE.json config 5 scale class,
# sequences at the bottom of the 100kbp-10Mbp band: 50 x ~184 kbp, 9.18 Mbp total,
# simulated with tools/sim_centromere from benchdata/anc.fasta on fifty.nwk).
# Runs ours then the reference binary on the same input, records wall/user/maxRSS.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/fifty_run

measure() {  # measure <tag> <cmd...>
  local tag=$1; shift
  python - "$tag" "$@" <<'PYEOF'
import json, resource, subprocess, sys, time
tag, cmd = sys.argv[1], sys.argv[2:]
t0 = time.monotonic()
with open(f"/tmp/fifty_run/{tag}.gfa", "wb") as out, \
     open(f"/tmp/fifty_run/{tag}.log", "wb") as err:
    rc = subprocess.run(cmd, stdout=out, stderr=err).returncode
wall = time.monotonic() - t0
ru = resource.getrusage(resource.RUSAGE_CHILDREN)
rec = {"tag": tag, "rc": rc, "wall_s": round(wall, 1),
       "user_s": round(ru.ru_utime, 1), "sys_s": round(ru.ru_stime, 1),
       "max_rss_gb": round(ru.ru_maxrss / 1024**2, 2)}
print(json.dumps(rec))
with open(f"/tmp/fifty_run/{tag}.json", "w") as f:
    json.dump(rec, f)
PYEOF
}

echo "== ours =="
measure ours python -m centrolign_tpu.cli -v 1 -T benchdata/fifty.nwk benchdata/fifty.fasta
tail -2 /tmp/fifty_run/ours.log

echo "== reference =="
measure ref /tmp/refbuild/centrolign -v 1 -T benchdata/fifty.nwk benchdata/fifty.fasta
tail -2 /tmp/fifty_run/ref.log

cmp -s /tmp/fifty_run/ours.gfa /tmp/fifty_run/ref.gfa && echo "GFA: byte-identical" \
    || echo "GFA: differs"
