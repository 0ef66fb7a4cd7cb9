#!/bin/bash
# Regenerate the four canonical NGP run artifacts after the eval-quadrature
# validation-budget change (logs/sweeps/eval_quadrature_r3{,b}.log), so the
# committed metrics.jsonl reflect the shipped configs. Old runs are moved to
# logs/<id>.r3pre (deleted after the new run succeeds; history keeps them).
set -e
cd "$(dirname "$0")/.."

rerun () {
  local id="$1" cfg="$2" tmo="$3"
  echo "=== rerun $id ($cfg) ==="
  if [ -d "logs/$id" ]; then mv "logs/$id" "logs/$id.r3pre"; fi
  if timeout "$tmo" python run_nerf.py --config "$cfg" > "/tmp/rerun_$id.log" 2>&1; then
    python -m nerf_kinematics_tpu.cli.plot_metrics "logs/$id" || true
    rm -rf "logs/$id.r3pre"
    echo "=== $id OK ==="
    tail -3 "/tmp/rerun_$id.log"
  else
    echo "=== $id FAILED (restoring previous artifacts) ==="
    rm -rf "logs/$id"
    mv "logs/$id.r3pre" "logs/$id"
    tail -20 "/tmp/rerun_$id.log"
    exit 1
  fi
}

rerun machina-ngp       configs/machina_ngp.yml       900
rerun machina-ngp-fast  configs/machina_ngp_fast.yml  900
rerun machina-ngp-hq    configs/machina_ngp_hq.yml    1500
rerun fox-ngp           configs/fox_ngp.yml           1500
echo "ALL RERUNS DONE"
