#!/bin/bash
# Regenerate the flagship + fast canonical artifacts after the round-4
# sampler decision (pixel_sampler: shuffled shipped in both configs —
# sampler study logs/sweeps/sampler_study_r4*, budget probe
# logs/sweeps/flagship_budget_r4.jsonl), so the committed metrics.jsonl
# reflect the shipped configs. HQ already ran under shuffled in round 3;
# fox is regenerated separately by the scale-study recipe decision.
# Old runs are moved to logs/<id>.r5pre and deleted after success.
set -e
cd "$(dirname "$0")/.."

rerun () {
  local id="$1" cfg="$2" tmo="$3"
  echo "=== rerun $id ($cfg) ==="
  if [ -d "logs/$id" ]; then mv "logs/$id" "logs/$id.r5pre"; fi
  if timeout "$tmo" python run_nerf.py --config "$cfg" > "/tmp/rerun_$id.log" 2>&1; then
    python -m nerf_kinematics_tpu.cli.plot_metrics "logs/$id" || true
    timeout 600 python run_nerf.py --config "$cfg" --eval \
      > "/tmp/rerun_${id}_eval.log" 2>&1 || true
    rm -rf "logs/$id.r5pre"
    echo "=== $id OK ==="
    tail -3 "/tmp/rerun_$id.log"
  else
    echo "=== $id FAILED (restoring previous artifacts) ==="
    rm -rf "logs/$id"
    mv "logs/$id.r5pre" "logs/$id"
    tail -20 "/tmp/rerun_$id.log"
    exit 1
  fi
}

rerun machina-ngp       configs/machina_ngp.yml       3600
rerun machina-ngp-fast  configs/machina_ngp_fast.yml  3600

# Mesh + turntable evidence follow the flagship checkpoint.
timeout 900 python scripts/mesh_evidence.py configs/machina_ngp.yml \
  --ckpt logs/machina-ngp/checkpoints --out logs/machina-ngp \
  > /tmp/rerun_mesh.log 2>&1
tail -3 /tmp/rerun_mesh.log
timeout 900 python run_nerf.py --config configs/machina_ngp.yml \
  --render-video --fast > /tmp/rerun_video.log 2>&1
tail -3 /tmp/rerun_video.log
python - <<'EOF'
# 8-frame contact strip from the rendered turntable (committable evidence).
import glob
import numpy as np
from PIL import Image

frames = sorted(glob.glob("logs/machina-ngp/video/frame_*.png"))
if not frames:
    frames = ["logs/machina-ngp/video/video.gif"]
    im = Image.open(frames[0])
    imgs = []
    try:
        while True:
            imgs.append(im.convert("RGB").copy())
            im.seek(im.tell() + 1)
    except EOFError:
        pass
else:
    imgs = [Image.open(f).convert("RGB") for f in frames]
idx = np.linspace(0, len(imgs) - 1, 8).astype(int)
strip = np.concatenate([np.asarray(imgs[i]) for i in idx], axis=1)
Image.fromarray(strip).save("logs/machina-ngp/turntable_strip.png")
print("turntable_strip.png:", strip.shape)
EOF
echo "ALL RERUNS DONE"
