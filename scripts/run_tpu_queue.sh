#!/bin/bash
# Round-3 TPU task queue: waits for the current tunnel job, then runs
# (1) flat-payload 1.3M rerun, (2) fused-dense bf16 compiled smoke,
# (3) hyperopt mini-run, (4) final bench warm with default env.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
L=.bench_logs/queue.log
while pgrep -x python -u root >/dev/null 2>&1 && ps -o cmd -C python | grep -q scale_1p3m; do
  sleep 60
done
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $L

echo "--- [1] flat-payload 1.3M rerun ---" >> $L
EPOCHS=3 timeout 4800 python scripts/scale_1p3m.py >> $L 2>&1
echo "rc=$? $(date -u +%H:%M:%S)" >> $L

echo "--- [2] fused-dense bf16 smoke ---" >> $L
DCA_TPU_MATMUL=bf16 timeout 1800 python scripts/fused_dense_bf16_smoke.py >> $L 2>&1
echo "rc=$? $(date -u +%H:%M:%S)" >> $L

echo "--- [3] hyper mini-run ---" >> $L
python - <<'PY' >> $L 2>&1
import numpy as np, pandas as pd
rs = np.random.RandomState(3)
mu = rs.gamma(2.,1.,(1,100)) * rs.lognormal(0,.3,(500,1)) * 4
c = rs.negative_binomial(2., 2./(2.+mu)).astype(int)
c[rs.uniform(size=c.shape)<.3]=0; c[0,:]+=1; c[:,0]+=1
pd.DataFrame(c.T, index=[f"g{i}" for i in range(100)],
             columns=[f"c{i}" for i in range(500)]).to_csv("/tmp/hyper_counts.tsv", sep="\t")
PY
timeout 3600 python -m dca_tpu /tmp/hyper_counts.tsv /tmp/hyper_out \
  --hyper --hypern 10 --hyperepoch 20 >> $L 2>&1
echo "rc=$? $(date -u +%H:%M:%S)" >> $L
ls /tmp/hyper_out >> $L 2>&1

echo "--- [4] final bench warm (default env) ---" >> $L
timeout 3600 python bench.py > .bench_logs/final_bench.json 2>> $L
echo "rc=$? $(date -u +%H:%M:%S)" >> $L
cat .bench_logs/final_bench.json >> $L
echo "=== queue done $(date -u +%H:%M:%S) ===" >> $L
