"""One-way converter: reference PyTorch checkpoints -> flax param pytrees.

The reference saves `{"ema_state_dict", "model_state_dict",
"optimizer_state_dict", "normalizer"}` via torch.save
(`/root/reference/TCDiff.py:266-274`). This module maps the
`DanceDecoder` state dict (`/root/reference/model/model.py:416-540`) onto the
parameter tree of `tcdiff_tpu.models.DanceDecoder`, so reference-trained
weights run on TPU and parity tests can compare the two nets on identical
parameters.

Only numpy crosses the boundary — no torch import is required here; pass any
mapping of name -> array-like (e.g. `{k: v.numpy() for k, v in sd.items()}`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _dense(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": _t(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _torch_mha(sd: Mapping, prefix: str, d: int) -> Dict:
    """torch.nn.MultiheadAttention -> TorchMHA (in_proj packs q|k|v rows)."""
    w = np.asarray(sd[prefix + ".in_proj_weight"])  # (3d, d)
    b = np.asarray(sd[prefix + ".in_proj_bias"])  # (3d,)
    return {
        "q_proj": {"kernel": _t(w[:d]), "bias": b[:d]},
        "k_proj": {"kernel": _t(w[d : 2 * d]), "bias": b[d : 2 * d]},
        "v_proj": {"kernel": _t(w[2 * d :]), "bias": b[2 * d :]},
        "out_proj": _dense(sd, prefix + ".out_proj"),
    }


def _sbi_msa(sd: Mapping, prefix: str) -> Dict:
    return {
        "w_qs": _dense(sd, prefix + ".w_qs", bias=False),
        "w_ks": _dense(sd, prefix + ".w_ks", bias=False),
        "w_vs": _dense(sd, prefix + ".w_vs", bias=False),
        "fc": _dense(sd, prefix + ".fc", bias=False),
        "layer_norm": _ln(sd, prefix + ".layer_norm"),
    }


def _concat_squash(sd: Mapping, prefix: str) -> Dict:
    return {
        "layer": _dense(sd, prefix + "._layer"),
        "hyper_bias": _dense(sd, prefix + "._hyper_bias", bias=False),
        "hyper_gate": _dense(sd, prefix + "._hyper_gate"),
    }


def _encoder_layer(sd: Mapping, prefix: str, d: int) -> Dict:
    return {
        "self_attn": _torch_mha(sd, prefix + ".self_attn", d),
        "linear1": _dense(sd, prefix + ".linear1"),
        "linear2": _dense(sd, prefix + ".linear2"),
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
    }


def _decoder_layer(sd: Mapping, prefix: str) -> Dict:
    out = {
        "self_attn": _sbi_msa(sd, prefix + ".self_attn"),
        "multihead_attn": _sbi_msa(sd, prefix + ".multihead_attn"),
        "linear1": _dense(sd, prefix + ".linear1"),
        "linear2": _dense(sd, prefix + ".linear2"),
        "linear3": _dense(sd, prefix + ".linear3"),
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
        "norm3": _ln(sd, prefix + ".norm3"),
        "norm4": _ln(sd, prefix + ".norm4"),
    }
    for i in (1, 2, 3):
        # DenseFiLM's Sequential is (Mish, Linear) so the Linear is .block.1
        out[f"film{i}"] = {"block": _dense(sd, prefix + f".film{i}.block.1")}
    for i in range(3):
        out[f"traj_mod{i}"] = _concat_squash(sd, prefix + f".traj_Modulation.{i}")
    return out


def dance_decoder_params_from_torch(
    state_dict: Mapping, num_layers: int = 8, latent_dim: int = 512
) -> Dict:
    """Map a reference DanceDecoder state dict to our flax params tree.

    Accepts keys with or without the DDP "module." prefix the reference
    re-adds per world size (`TCDiff.py:113-120`).
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        sd[k] = np.asarray(v)

    p: Dict = {
        "input_projection": _dense(sd, "input_projection"),
        "final_layer": _dense(sd, "final_layer"),
        "traj_embedding_0": _dense(sd, "traj_embedding.0"),
        "traj_embedding_1": _dense(sd, "traj_embedding.2"),
        "relative_projection_0": _dense(sd, "relative_projection_layer.0"),
        "relative_projection_1": _dense(sd, "relative_projection_layer.2"),
        "relative_projection_2": _dense(sd, "relative_projection_layer.4"),
        "cond_projection_0": _dense(sd, "cond_projection.0"),
        "cond_projection_1": _dense(sd, "cond_projection.2"),
        "non_attn_norm": _ln(sd, "non_attn_cond_projection.0"),
        "non_attn_dense0": _dense(sd, "non_attn_cond_projection.1"),
        "non_attn_dense1": _dense(sd, "non_attn_cond_projection.3"),
        "time_mlp": _dense(sd, "time_mlp.1"),
        "to_time_cond": _dense(sd, "to_time_cond.0"),
        "to_time_tokens": _dense(sd, "to_time_tokens.0"),
        "norm_cond": _ln(sd, "norm_cond"),
        "null_cond_embed": np.asarray(sd["null_cond_embed"]),
        "null_cond_hidden": np.asarray(sd["null_cond_hidden"]),
        "embeddings_table": np.asarray(sd["embeddings_table.weight"]),
    }
    for i in range(2):
        p[f"cond_encoder_{i}"] = _encoder_layer(sd, f"cond_encoder.{i}", latent_dim)
    for i in range(num_layers):
        p[f"decoder_{i}"] = _decoder_layer(sd, f"seqTransDecoder.stack.{i}")
    return p


def traj_decoder_params_from_torch(state_dict: Mapping, trans_layer: int = 6) -> Dict:
    """Map a reference TrajDecoder `{'net': state_dict}` checkpoint
    (`TrajDecoder/train_traj.py:281-282`) onto our flax TrajDecoder."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    lstm = {}
    for layer in range(3):
        for name in (f"weight_ih_l{layer}", f"weight_hh_l{layer}",
                     f"bias_ih_l{layer}", f"bias_hh_l{layer}"):
            lstm[name] = np.asarray(sd[f"lstm.{name}"])

    p: Dict = {
        "lstm": lstm,
        "music_projection_0": _dense(sd, "music_projection.0"),
        "music_projection_1": _dense(sd, "music_projection.2"),
        "music_projection_2": _dense(sd, "music_projection.4"),
        "cond_emb": _dense(sd, "trans_extractor.cond_emb"),
        # dead parameter (`traj_model.py:80`), carried for round-tripping
        "traj_emb_kernel": _t(sd["trans_extractor.traj_emb.weight"]),
        "traj_emb_bias": np.asarray(sd["trans_extractor.traj_emb.bias"]),
        "decoder_0": _dense(sd, "Decoder.0"),
        "decoder_1": _dense(sd, "Decoder.2"),
        "decoder_2": _dense(sd, "Decoder.4"),
        "decoder_3": _dense(sd, "Decoder.6"),
    }
    for i in range(trans_layer):
        pre = f"trans_extractor.blocks.{i}"
        p[f"block_{i}"] = {
            "ln1": _ln(sd, pre + ".ln1"),
            "ln2": _ln(sd, pre + ".ln2"),
            "query": _dense(sd, pre + ".attn.query"),
            "key": _dense(sd, pre + ".attn.key"),
            "value": _dense(sd, pre + ".attn.value"),
            "proj": _dense(sd, pre + ".attn.proj"),
            "mlp0": _dense(sd, pre + ".mlp.0"),
            "mlp2": _dense(sd, pre + ".mlp.2"),
        }
    return p


# --------------------------------------------------------------- reverse map
def _w(kernel) -> np.ndarray:
    """flax kernel (in, out) -> torch Linear weight (out, in)."""
    return np.ascontiguousarray(np.asarray(kernel).T)


def _dense_out(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[prefix + ".weight"] = _w(p["kernel"])
    if "bias" in p:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _ln_out(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _mha_out(sd: Dict, prefix: str, p: Mapping) -> None:
    sd[prefix + ".in_proj_weight"] = np.concatenate(
        [_w(p["q_proj"]["kernel"]), _w(p["k_proj"]["kernel"]), _w(p["v_proj"]["kernel"])]
    )
    sd[prefix + ".in_proj_bias"] = np.concatenate(
        [np.asarray(p["q_proj"]["bias"]), np.asarray(p["k_proj"]["bias"]),
         np.asarray(p["v_proj"]["bias"])]
    )
    _dense_out(sd, prefix + ".out_proj", p["out_proj"])


def _sbi_out(sd: Dict, prefix: str, p: Mapping) -> None:
    for name in ("w_qs", "w_ks", "w_vs", "fc"):
        _dense_out(sd, f"{prefix}.{name}", p[name])
    _ln_out(sd, prefix + ".layer_norm", p["layer_norm"])


def _rotary_freqs(dim: int) -> np.ndarray:
    """The reference RotaryEmbedding's deterministic freqs buffer
    (`model/rotary_embedding_torch.py:75-90`); our flax tree computes these
    on the fly, so the reverse converter re-emits them."""
    # compute in float32 throughout to match torch's buffer bit-for-bit
    exponent = np.arange(0, dim, 2, dtype=np.float32) / np.float32(dim)
    return (np.float32(1.0) / np.float32(10000.0) ** exponent).astype(np.float32)


def dance_decoder_params_to_torch(
    params: Mapping, num_layers: int = 8, latent_dim: int = 512
) -> Dict:
    """Inverse of `dance_decoder_params_from_torch`: our flax param tree ->
    a reference-format state dict (numpy values), so TPU-trained weights run
    in the PyTorch reference (`model/model.py:416-540` layout)."""
    sd: Dict = {"rotary.freqs": _rotary_freqs(latent_dim)}
    _dense_out(sd, "input_projection", params["input_projection"])
    _dense_out(sd, "final_layer", params["final_layer"])
    _dense_out(sd, "traj_embedding.0", params["traj_embedding_0"])
    _dense_out(sd, "traj_embedding.2", params["traj_embedding_1"])
    for i, src in enumerate(("relative_projection_0", "relative_projection_1", "relative_projection_2")):
        _dense_out(sd, f"relative_projection_layer.{2 * i}", params[src])
    _dense_out(sd, "cond_projection.0", params["cond_projection_0"])
    _dense_out(sd, "cond_projection.2", params["cond_projection_1"])
    _ln_out(sd, "non_attn_cond_projection.0", params["non_attn_norm"])
    _dense_out(sd, "non_attn_cond_projection.1", params["non_attn_dense0"])
    _dense_out(sd, "non_attn_cond_projection.3", params["non_attn_dense1"])
    _dense_out(sd, "time_mlp.1", params["time_mlp"])
    _dense_out(sd, "to_time_cond.0", params["to_time_cond"])
    _dense_out(sd, "to_time_tokens.0", params["to_time_tokens"])
    _ln_out(sd, "norm_cond", params["norm_cond"])
    sd["null_cond_embed"] = np.asarray(params["null_cond_embed"])
    sd["null_cond_hidden"] = np.asarray(params["null_cond_hidden"])
    sd["embeddings_table.weight"] = np.asarray(params["embeddings_table"])
    for i in range(2):
        enc = params[f"cond_encoder_{i}"]
        pre = f"cond_encoder.{i}"
        sd[pre + ".rotary.freqs"] = _rotary_freqs(latent_dim)
        _mha_out(sd, pre + ".self_attn", enc["self_attn"])
        _dense_out(sd, pre + ".linear1", enc["linear1"])
        _dense_out(sd, pre + ".linear2", enc["linear2"])
        _ln_out(sd, pre + ".norm1", enc["norm1"])
        _ln_out(sd, pre + ".norm2", enc["norm2"])
    for i in range(num_layers):
        dec = params[f"decoder_{i}"]
        pre = f"seqTransDecoder.stack.{i}"
        sd[pre + ".rotary.freqs"] = _rotary_freqs(latent_dim)
        _sbi_out(sd, pre + ".self_attn", dec["self_attn"])
        _sbi_out(sd, pre + ".multihead_attn", dec["multihead_attn"])
        for name in ("linear1", "linear2", "linear3"):
            _dense_out(sd, f"{pre}.{name}", dec[name])
        for name in ("norm1", "norm2", "norm3", "norm4"):
            _ln_out(sd, f"{pre}.{name}", dec[name])
        for j in (1, 2, 3):
            _dense_out(sd, f"{pre}.film{j}.block.1", dec[f"film{j}"]["block"])
        for j in range(3):
            cs = dec[f"traj_mod{j}"]
            _dense_out(sd, f"{pre}.traj_Modulation.{j}._layer", cs["layer"])
            _dense_out(sd, f"{pre}.traj_Modulation.{j}._hyper_bias", cs["hyper_bias"])
            _dense_out(sd, f"{pre}.traj_Modulation.{j}._hyper_gate", cs["hyper_gate"])
    return sd
