"""Legacy checkpoint compatibility with the reference's torch format.

The classic-NeRF reference persists ``checkpoint{iter}.ckpt`` as a torch zip
pickle with keys ``iter / model_coarse_state_dict / model_fine_state_dict /
optimizer_state_dict / loss / psnr`` (verified by unpickling
trained_models/nerf-pytorch/*/checkpoint110000.ckpt, SURVEY.md §5.4). This
module maps those state dicts to/from our flax parameter pytrees so reference
checkpoints can be imported for PSNR-parity evaluation and our checkpoints can
be exported for reference tooling.

Name mapping (torch → flax):
  layer1.weight         → params/layer1/kernel        (transposed)
  layers_xyz.N.weight   → params/layers_xyz_N/kernel  (transposed)
  fc_feat / fc_alpha / fc_rgb / layers_dir.0 likewise.
"""

from __future__ import annotations

import numpy as np


def _to_flax_name(torch_key: str):
    """'layers_xyz.0.weight' → ('layers_xyz_0', 'kernel')."""
    parts = torch_key.split(".")
    leaf = parts[-1]
    mod = "_".join(parts[:-1])
    return mod, {"weight": "kernel", "bias": "bias"}[leaf]


def torch_state_dict_to_flax(sd: dict) -> dict:
    """Torch state dict (tensors or ndarrays) → flax params pytree
    ({'params': {module: {'kernel','bias'}}})."""
    params = {}
    for k, v in sd.items():
        mod, leaf = _to_flax_name(k)
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                         dtype=np.float32)
        if leaf == "kernel":
            arr = arr.T  # torch Linear stores (out, in); flax Dense (in, out)
        params.setdefault(mod, {})[leaf] = arr
    return {"params": params}


def flax_to_torch_state_dict(params: dict) -> dict:
    """Inverse mapping; returns numpy arrays keyed by torch names."""
    out = {}
    for mod, leaves in params["params"].items():
        if mod.startswith("layers_xyz_") or mod.startswith("layers_dir_"):
            base, idx = mod.rsplit("_", 1)
            torch_mod = f"{base}.{idx}"
        else:
            torch_mod = mod
        for leaf, arr in leaves.items():
            arr = np.asarray(arr, dtype=np.float32)
            if leaf == "kernel":
                out[f"{torch_mod}.weight"] = arr.T
            else:
                out[f"{torch_mod}.bias"] = arr
    return out


def import_legacy_checkpoint(path):
    """Load a reference checkpoint{iter}.ckpt.

    Returns dict with keys: step, params_coarse, params_fine (flax pytrees),
    loss, psnr.
    """
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    out = {
        "step": int(ck.get("iter", 0)),
        "params_coarse": torch_state_dict_to_flax(ck["model_coarse_state_dict"]),
        "params_fine": None,
        "loss": float(ck["loss"]) if "loss" in ck else None,
        "psnr": float(ck["psnr"]) if "psnr" in ck else None,
    }
    if ck.get("model_fine_state_dict"):
        out["params_fine"] = torch_state_dict_to_flax(ck["model_fine_state_dict"])
    return out


def export_legacy_checkpoint(path, step, params_coarse, params_fine=None,
                             loss=None, psnr=None, optimizer_state=None):
    """Write a reference-layout checkpoint consumable by the torch stack."""
    import torch

    def to_torch(sd):
        return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}

    ck = {
        "iter": int(step),
        "model_coarse_state_dict": to_torch(flax_to_torch_state_dict(params_coarse)),
        "model_fine_state_dict": (
            to_torch(flax_to_torch_state_dict(params_fine))
            if params_fine is not None
            else None
        ),
        "optimizer_state_dict": optimizer_state or {},
        "loss": float(loss) if loss is not None else None,
        "psnr": float(psnr) if psnr is not None else None,
    }
    torch.save(ck, path)
