"""Import reference PyTorch VAE checkpoints into Flax parameters.

The reference ships/consumes ``vae-best.pt`` state dicts loaded with
``torch.load`` + ``load_state_dict`` (reference README.md:90-93,
notebook/index.ipynb cell 5). This module maps that state dict onto the
latice_tpu Flax `VariationalAutoEncoderRawData`, bridging the layout
differences between the two frameworks:

* conv kernels: torch OIHW -> flax HWIO;
* transposed-conv kernels: torch (in, out, kh, kw) -> flax HWIO with a
  **spatially flipped** kernel (lax.conv_transpose with transpose_kernel=False
  correlates where torch convolves);
* linear weights: torch (out, in) -> flax (in, out), with the encoder-side
  bottleneck permuted from torch's flatten order C,H,W (model.py:57:
  ``encoder_out.flatten(1, -1)``) to NHWC flatten order H,W,C — and the
  decoder-side ``linear2`` permuted back (model.py:64 ``out.view(...)``).

Sequential-module indices in the reference state dict (e.g.
``encoder.0.0.weight``) are mapped positionally onto the named latice_tpu
modules; InstanceNorm has no parameters in either framework (affine=False).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = ["torch_state_dict_to_flax", "load_torch_checkpoint"]


def _conv(w: np.ndarray, b: np.ndarray) -> dict:
    """torch Conv2d OIHW -> flax {kernel: HWIO, bias}."""
    return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}


def _conv_transpose(w: np.ndarray, b: np.ndarray) -> dict:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose HWIO.

    flax's ConvTranspose (transpose_kernel=False) computes a fractionally
    strided *correlation*; torch's computes a convolution — the kernels
    differ by a spatial flip.
    """
    k = np.transpose(w, (2, 3, 0, 1))  # -> (kh, kw, in, out)
    k = k[::-1, ::-1, :, :]
    return {"kernel": np.ascontiguousarray(k), "bias": b}


def _dense(w: np.ndarray, b: np.ndarray) -> dict:
    """torch Linear (out, in) -> flax {kernel: (in, out), bias}."""
    return {"kernel": np.transpose(w, (1, 0)), "bias": b}


def _bottleneck_in_perm(inplanes: int) -> np.ndarray:
    """Permutation mapping torch CHW-flatten indices to NHWC HWC-flatten.

    The 4x4x(4*inplanes) encoder output is flattened C-major by torch
    (model.py:57) and HWC-major here; dense kernels must be re-indexed.
    """
    c, h, w = 4 * inplanes, 4, 4
    # index in torch order (c, h, w) -> position in flax order (h, w, c)
    idx = np.arange(c * h * w).reshape(c, h, w)
    return np.transpose(idx, (1, 2, 0)).reshape(-1)  # flax position -> torch index


def torch_state_dict_to_flax(
    state_dict: Mapping[str, Any], inplanes: int = 32, latent_dim: int = 16
) -> dict:
    """Convert a reference VAE state dict to a latice_tpu params pytree.

    Args:
        state_dict: torch ``model.state_dict()`` (tensors or numpy arrays) of
            the reference `VariationalAutoEncoderRawData` (latice/model.py:83).
        inplanes / latent_dim: Architecture hyperparameters (must match).

    Returns:
        Flax ``params`` dict for latice_tpu's VariationalAutoEncoderRawData.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    # Tolerate Lightning-style "model." prefixes (checkpoint["state_dict"]).
    if sd and all(k.startswith("model.") for k in sd):
        sd = {k[len("model.") :]: v for k, v in sd.items()}

    # Reference encoder nn.Sequential layout (model.py:109-125):
    # indices 0,1 convblocks; 2 pool; 3,4; 5; 6,7; 8; 9,10; 11; 12,13; 14.
    enc_block_idx = [(0, 0), (1, 1), (3, 2), (4, 3), (6, 4), (7, 5), (9, 6), (10, 7), (12, 8), (13, 9)]
    encoder: dict[str, Any] = {}
    for torch_i, flat_j in enc_block_idx:
        stage, block = divmod(flat_j, 2)
        encoder[f"stage{stage}_block{block}"] = {
            "conv": _conv(
                sd[f"encoder.{torch_i}.0.weight"], sd[f"encoder.{torch_i}.0.bias"]
            )
        }

    # Decoder nn.Sequential layout (model.py:133-150):
    # 0 up; 1,2 tblocks; 3 up; 4,5; 6 up; 7,8; 9 up; 10,11; 12 up; 13 tblock; 14 conv.
    dec_block_idx = [(1, 0), (2, 1), (4, 2), (5, 3), (7, 4), (8, 5), (10, 6), (11, 7), (13, 8)]
    decoder: dict[str, Any] = {}
    for torch_i, flat_j in dec_block_idx:
        stage, block = divmod(flat_j, 2)
        decoder[f"stage{stage}_block{block}"] = {
            "conv": _conv_transpose(
                sd[f"decoder.{torch_i}.0.weight"], sd[f"decoder.{torch_i}.0.bias"]
            )
        }
    decoder["logit_conv"] = _conv(sd["decoder.14.weight"], sd["decoder.14.bias"])

    perm = _bottleneck_in_perm(inplanes)
    mu = _dense(sd["mu.0.weight"], sd["mu.0.bias"])
    logvar = _dense(sd["logvar.0.weight"], sd["logvar.0.bias"])
    mu["kernel"] = mu["kernel"][perm]  # rows indexed by flattened features
    logvar["kernel"] = logvar["kernel"][perm]

    linear2 = _dense(sd["linear2.0.weight"], sd["linear2.0.bias"])
    # linear2 output feeds the torch view to (C, 4, 4); our reshape is
    # (4, 4, C) — permute output columns and bias accordingly.
    linear2["kernel"] = linear2["kernel"][:, perm]
    linear2["bias"] = linear2["bias"][perm]

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "mu": mu,
        "logvar": logvar,
        "linear2": linear2,
    }
    return _to_float32_tree(params)


def load_torch_checkpoint(
    path: str, inplanes: int = 32, latent_dim: int = 16
) -> dict:
    """Load a ``.pt`` checkpoint file and convert it (torch required)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return torch_state_dict_to_flax(state_dict, inplanes, latent_dim)


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _to_float32_tree(tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: _to_float32_tree(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)
