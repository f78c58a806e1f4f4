"""Checkpointing with sidecar metadata.

Equivalent of the reference's checkpoint module
(/root/reference/wekws/utils/checkpoint.py:23-57): model state ->
``<epoch>.ckpt`` (flax msgpack of {params, batch_stats}) plus a sidecar
``<epoch>.yaml`` {epoch, lr, cv_loss}; ``final.ckpt`` symlink at the
end of training (train.py:245-247).
"""

import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import yaml


def save_checkpoint(
    path: str,
    params: Any,
    batch_stats: Any = None,
    info: Optional[Dict] = None,
) -> None:
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats or {}),
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    if info is not None:
        with open(os.path.splitext(path)[0] + ".yaml", "w") as f:
            yaml.dump({k: float(v) for k, v in info.items()}, f)


def load_checkpoint(path: str, template: Any = None) -> Tuple[Any, Any]:
    """Returns (params, batch_stats).  With ``template`` (a matching
    {params, batch_stats} pytree) arrays are restored with its exact
    structure; otherwise a raw nested-dict state is returned."""
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        payload = flax.serialization.from_bytes(template, data)
    else:
        payload = flax.serialization.msgpack_restore(data)
    return payload["params"], payload.get("batch_stats", {})


def load_checkpoint_info(path: str) -> Dict:
    side = os.path.splitext(path)[0] + ".yaml"
    if os.path.exists(side):
        with open(side) as f:
            return yaml.safe_load(f) or {}
    return {}


def link_final(model_dir: str, epoch: int, name: str = "final.ckpt") -> None:
    target = f"{epoch}.ckpt"
    final = os.path.join(model_dir, name)
    if os.path.lexists(final):
        os.remove(final)
    os.symlink(target, final)
