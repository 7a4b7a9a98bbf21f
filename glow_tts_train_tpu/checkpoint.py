"""Checkpoint save/load + torch-checkpoint import.

Reference equivalent: `checkpoint.py` (:18-106) — a torch pickle holding
``{model, global_step, learning_rate, version, optimizer}``.  Here the native
artifact is a single ``.npz`` with flattened pytree keys plus a JSON metadata
blob — single-file, framework-neutral, and mmap-friendly.  Loading performs
the reference's tolerant merge (:84-93): keys missing from the checkpoint
keep their fresh-init values with a warning.

`import_torch_checkpoint` maps a reference ``.pth`` state dict onto our param
pytree (weight-norm g/v, conv layout, and block stacking included) so
reference-trained models run (and are parity-tested) on TPU.
"""

import io
import json
import logging
import typing
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import TrainingConfig
from .models import hyper_from_config, init_model
from .optimize import make_optimizer

_LOGGER = logging.getLogger("glow_tts_train_tpu.checkpoint")

Params = typing.Dict[str, typing.Any]

_META_KEY = "__meta__"


@dataclass
class Checkpoint:
    params: Params
    learning_rate: float
    global_step: int
    version: int
    opt_state: typing.Any = None


def _flatten(tree, prefix: str) -> typing.Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(_path_elem(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_elem(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _opt_fingerprint(opt_state) -> str:
    """Structural fingerprint of an optimizer state: the treedef string.

    Stored with the checkpoint so a changed optax chain (reordered, resized,
    different transforms) is detected at load time instead of silently
    zipping saved leaves onto the wrong slots whenever shapes happen to
    match."""
    return str(jax.tree_util.tree_structure(opt_state))


def save_checkpoint(checkpoint: Checkpoint, checkpoint_path: Path) -> None:
    """Write a checkpoint.

    ``.npz`` suffix → single portable file (default).  ``.orbax`` suffix →
    an Orbax directory checkpoint: async-write, multi-host-safe, and stores
    arrays per-shard — the format to use at pod scale (each process writes
    its addressable shards instead of gathering to host 0).
    """
    checkpoint_path = Path(checkpoint_path)
    if checkpoint_path.suffix == ".orbax":
        return _save_orbax(checkpoint, checkpoint_path)
    checkpoint_path.parent.mkdir(parents=True, exist_ok=True)

    arrays = _flatten(checkpoint.params, "model/")
    meta = {
        "global_step": checkpoint.global_step,
        "learning_rate": checkpoint.learning_rate,
        "version": checkpoint.version,
    }
    if checkpoint.opt_state is not None:
        # opt leaves are named by tree path (like params) and guarded by a
        # structure fingerprint — never zipped positionally
        arrays.update(_flatten(checkpoint.opt_state, "opt/"))
        meta["opt_treedef"] = _opt_fingerprint(checkpoint.opt_state)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    checkpoint_path.write_bytes(buf.getvalue())


def _merge_into(fresh: Params, saved: typing.Dict[str, np.ndarray]) -> Params:
    """Tolerant merge (reference checkpoint.py:84-93): saved values win,
    missing keys keep fresh-init values with a warning."""
    used = set()

    def visit(path, leaf):
        key = "model/" + "/".join(_path_elem(p) for p in path)
        if key in saved:
            fresh = np.asarray(leaf)
            if saved[key].shape != fresh.shape:
                # silent shape mismatches would alias embeddings / crash far
                # from the cause — keep the fresh-init value instead
                _LOGGER.warning(
                    "checkpoint key %s has shape %s but the model expects %s; "
                    "keeping fresh-init values",
                    key,
                    saved[key].shape,
                    fresh.shape,
                )
                return leaf
            used.add(key)
            return saved[key].astype(fresh.dtype)
        _LOGGER.warning("%s is not in the checkpoint", key)
        return leaf

    merged = jax.tree_util.tree_map_with_path(visit, fresh)
    for key in saved:
        if key.startswith("model/") and key not in used:
            _LOGGER.warning("checkpoint key %s not used by the model", key)
    return merged


def _migrate_flat_opt_state(fresh_opt_state, saved):
    """Convert a legacy flat-vector optimizer state to the tree form.

    Until round 2 the optimizer ran over one raveled fp32 vector, so saved
    Adam moments are single flat arrays under ``1/mu`` / ``1/nu`` (chain
    position 1 = scale_by_adam) with counts at ``1/count`` / ``2/count``.
    The flat layout is exactly ``ravel_pytree`` order of the param tree, so
    the moments split losslessly onto the tree leaves.  Returns None when
    ``saved`` is not a flat-form state (caller falls back to fresh)."""
    if not {"1/mu", "1/nu", "1/count"} <= set(saved):
        return None
    flat_mu, flat_nu = saved["1/mu"], saved["1/nu"]
    if flat_mu.ndim != 1 or flat_nu.ndim != 1:
        return None

    flat_with_path = jax.tree_util.tree_flatten_with_path(fresh_opt_state)[0]
    treedef = jax.tree_util.tree_structure(fresh_opt_state)
    leaves = []
    offsets = {"mu": 0, "nu": 0}
    total = {"mu": flat_mu.size, "nu": flat_nu.size}
    sources = {"mu": flat_mu, "nu": flat_nu}
    for path, leaf in flat_with_path:
        parts = [_path_elem(p) for p in path]
        moment = parts[1] if len(parts) >= 2 and parts[0] == "1" else None
        if moment in ("mu", "nu"):
            size = int(np.prod(np.shape(leaf), dtype=np.int64))
            start = offsets[moment]
            if start + size > total[moment]:
                return None  # param count changed — not migratable
            chunk = sources[moment][start : start + size]
            leaves.append(
                chunk.reshape(np.shape(leaf)).astype(np.asarray(leaf).dtype)
            )
            offsets[moment] = start + size
        elif parts and parts[-1] == "count":
            key = "/".join(parts)
            if key not in saved:
                return None
            leaves.append(saved[key].astype(np.asarray(leaf).dtype))
        else:
            leaves.append(leaf)  # stateless transforms (clip)
    if offsets["mu"] != total["mu"] or offsets["nu"] != total["nu"]:
        return None  # leftover elements — param count changed
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _restore_opt_state(
    fresh_opt_state,
    saved: typing.Dict[str, np.ndarray],
    fingerprint: typing.Optional[str],
) -> typing.Any:
    """All-or-nothing optimizer-state restore.

    ``saved`` maps tree-path keys (no ``opt/`` prefix) to arrays.  Any
    divergence — fingerprint mismatch, missing/extra keys, or a single
    shape mismatch — discards the ENTIRE saved state with a warning and
    returns the fresh state: a clean restart beats a silent mix of restored
    Adam mu with fresh-init nu/count."""
    flat_with_path = jax.tree_util.tree_flatten_with_path(fresh_opt_state)[0]
    treedef = jax.tree_util.tree_structure(fresh_opt_state)
    paths = [
        "/".join(_path_elem(p) for p in path) for path, _ in flat_with_path
    ]
    leaves = [leaf for _, leaf in flat_with_path]

    def fresh(reason: str):
        _LOGGER.warning(
            "discarding saved optimizer state (%s); using fresh optimizer "
            "state — training resumes but Adam moments restart",
            reason,
        )
        return fresh_opt_state

    if fingerprint is None:
        # legacy checkpoint with positional opt/NNNN keys
        keys = sorted(saved)
        if len(keys) != len(leaves):
            return fresh(f"{len(keys)} saved vs {len(leaves)} fresh leaves")
        if any(np.shape(l) != saved[k].shape for k, l in zip(keys, leaves)):
            return fresh("leaf shape mismatch in legacy positional state")
        return jax.tree_util.tree_unflatten(
            treedef,
            [
                saved[k].astype(np.asarray(l).dtype)
                for k, l in zip(keys, leaves)
            ],
        )

    if fingerprint != _opt_fingerprint(fresh_opt_state):
        migrated = _migrate_flat_opt_state(fresh_opt_state, saved)
        if migrated is not None:
            _LOGGER.info(
                "migrated legacy flat-vector optimizer state to tree form "
                "(Adam moments and schedule count preserved)"
            )
            return migrated
        return fresh("optimizer structure changed since save")
    if set(saved) != set(paths):
        return fresh("optimizer state keys do not match")
    if any(np.shape(l) != saved[p].shape for p, l in zip(paths, leaves)):
        return fresh("optimizer leaf shape mismatch")
    return jax.tree_util.tree_unflatten(
        treedef,
        [saved[p].astype(np.asarray(l).dtype) for p, l in zip(paths, leaves)],
    )


def _save_orbax(checkpoint: Checkpoint, path: Path) -> None:
    import orbax.checkpoint as ocp

    tree = {
        "model": checkpoint.params,
        "meta": {
            "global_step": np.asarray(checkpoint.global_step),
            "learning_rate": np.asarray(checkpoint.learning_rate),
            "version": np.asarray(checkpoint.version),
        },
    }
    if checkpoint.opt_state is not None:
        # path-named leaves ("/" → "." since orbax reserves "/") plus the
        # structure fingerprint, same all-or-nothing contract as .npz
        tree["opt"] = {
            k[len("opt/"):].replace("/", "."): v
            for k, v in _flatten(checkpoint.opt_state, "opt/").items()
        }
        tree["meta"]["opt_treedef"] = np.frombuffer(
            _opt_fingerprint(checkpoint.opt_state).encode("utf-8"),
            dtype=np.uint8,
        ).copy()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.absolute(), tree, force=True)
    ckptr.wait_until_finished()


def _load_orbax(path: Path, config: TrainingConfig, load_optimizer: bool) -> Checkpoint:
    import orbax.checkpoint as ocp

    # Restore every leaf as a HOST numpy array, not onto the saved
    # shardings: a checkpoint written by a 2-process x 2-device run must
    # load on any topology (single host, different device count, CPU vs
    # TPU) — StandardCheckpointer.restore without a target re-applies the
    # saved device ids and raises on mismatch (caught by
    # tests/test_multihost.py restore-and-continue).  The caller merges
    # into fresh params and re-shards for whatever mesh it runs under.
    ckptr = ocp.PyTreeCheckpointer()
    meta_tree = ckptr.metadata(path.absolute()).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
    )
    tree = ckptr.restore(path.absolute(), restore_args=restore_args)
    saved = _flatten(tree["model"], "model/")

    hp = hyper_from_config(config)
    fresh = init_model(jax.random.PRNGKey(config.seed), hp)
    params = _merge_into(fresh, saved)

    opt_state = None
    if load_optimizer:
        tx = make_optimizer(config)
        opt_state = tx.init(jax.tree_util.tree_map(jnp.asarray, params))
        if "opt" in tree:
            fp_arr = tree["meta"].get("opt_treedef")
            fingerprint = (
                bytes(np.asarray(fp_arr)).decode("utf-8")
                if fp_arr is not None
                else None
            )
            saved_opt = {
                k.replace(".", "/"): np.asarray(v)
                for k, v in tree["opt"].items()
            }
            opt_state = _restore_opt_state(opt_state, saved_opt, fingerprint)

    meta = tree["meta"]
    return Checkpoint(
        params=params,
        opt_state=opt_state,
        learning_rate=float(meta["learning_rate"]),
        global_step=int(meta["global_step"]),
        version=int(meta["version"]),
    )


def load_checkpoint(
    checkpoint_path: Path,
    config: TrainingConfig,
    load_optimizer: bool = True,
) -> Checkpoint:
    """Load a checkpoint: .npz (native), .orbax (directory), or .pth
    (reference torch import); missing keys keep fresh-init values."""
    checkpoint_path = Path(checkpoint_path)
    if checkpoint_path.suffix == ".orbax":
        return _load_orbax(checkpoint_path, config, load_optimizer)
    if checkpoint_path.suffix == ".pth":
        import torch

        ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
        sd = ckpt["model"] if "model" in ckpt else ckpt
        params = import_torch_state_dict(sd, config)
        opt_state = None
        if load_optimizer and isinstance(ckpt.get("optimizer"), dict):
            opt_state = import_torch_opt_state(
                ckpt["optimizer"], sd, config, params
            )
        return Checkpoint(
            params=params,
            opt_state=opt_state,
            learning_rate=float(ckpt.get("learning_rate", 1.0)),
            global_step=int(ckpt.get("global_step", 1)),
            version=int(ckpt.get("version", 1)),
        )

    with np.load(checkpoint_path, allow_pickle=False) as data:
        saved = {k: data[k] for k in data.files}

    meta = json.loads(bytes(saved.pop(_META_KEY)).decode("utf-8"))

    hp = hyper_from_config(config)
    fresh = init_model(jax.random.PRNGKey(config.seed), hp)
    params = _merge_into(fresh, saved)

    opt_state = None
    if load_optimizer:
        tx = make_optimizer(config)
        # optimizer state mirrors the param tree (training.py)
        opt_state = tx.init(jax.tree_util.tree_map(jnp.asarray, params))
        saved_opt = {
            k[len("opt/"):]: v for k, v in saved.items() if k.startswith("opt/")
        }
        if saved_opt:
            opt_state = _restore_opt_state(
                opt_state, saved_opt, meta.get("opt_treedef")
            )

    return Checkpoint(
        params=params,
        opt_state=opt_state,
        learning_rate=float(meta.get("learning_rate", 1.0)),
        global_step=int(meta.get("global_step", 1)),
        version=int(meta.get("version", 1)),
    )


# ---------------------------------------------------------------------------
# Torch (.pth) checkpoint import
# ---------------------------------------------------------------------------


def _t(a) -> np.ndarray:
    # copy=True: .numpy() VIEWS the torch storage, and jax's CPU backend
    # zero-copies aligned numpy buffers — importing from a live nn.Module
    # would otherwise alias its parameters, and a later torch
    # optimizer.step() would silently mutate our "imported" params
    # (ascontiguousarray alone does not copy already-contiguous arrays)
    return np.array(a.detach().cpu().numpy(), copy=True)


def _conv_w(a) -> np.ndarray:
    """torch conv weight [out, in, k] -> ours [k, in, out]."""
    return _t(a).transpose(2, 1, 0)


def _wn_conv(sd, prefix: str) -> typing.Dict[str, np.ndarray]:
    """torch weight-normed conv -> {v, g, b}."""
    return {
        "v": _conv_w(sd[prefix + ".weight_v"]),
        "g": _t(sd[prefix + ".weight_g"]).reshape(-1),
        "b": _t(sd[prefix + ".bias"]),
    }


def _plain_conv(sd, prefix: str) -> typing.Dict[str, np.ndarray]:
    return {"w": _conv_w(sd[prefix + ".weight"]), "b": _t(sd[prefix + ".bias"])}


def _norm(sd, prefix: str) -> typing.Dict[str, np.ndarray]:
    return {"gamma": _t(sd[prefix + ".gamma"]), "beta": _t(sd[prefix + ".beta"])}


def _stack(dicts: typing.List[dict]) -> dict:
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *dicts)


def import_torch_state_dict(sd: dict, config: TrainingConfig) -> Params:
    """Map a reference FlowGenerator state dict onto our param pytree.

    Handles: conv layout [out,in,k]→[k,in,out], weight-norm (g, v) pairs,
    ActNorm [1,c,1]→[c], per-layer module lists → stacked scan params.
    """
    m = config.model
    n_layers_enc = m.n_layers_enc
    n_blocks = m.n_blocks_dec
    n_wn_layers = m.n_block_layers

    params: Params = {"emb": _t(sd["encoder.emb.weight"])}

    if m.prenet:
        layers = []
        for i in range(3):
            layers.append(
                {
                    "conv": _plain_conv(sd, f"encoder.pre.conv_layers.{i}"),
                    "norm": _norm(sd, f"encoder.pre.norm_layers.{i}"),
                }
            )
        params["prenet"] = {
            "layers": _stack(layers),
            "proj": _plain_conv(sd, "encoder.pre.proj"),
        }

    enc_layers = []
    for i in range(n_layers_enc):
        attn = {
            "q": _plain_conv(sd, f"encoder.encoder.attn_layers.{i}.conv_q"),
            "k": _plain_conv(sd, f"encoder.encoder.attn_layers.{i}.conv_k"),
            "v": _plain_conv(sd, f"encoder.encoder.attn_layers.{i}.conv_v"),
            "o": _plain_conv(sd, f"encoder.encoder.attn_layers.{i}.conv_o"),
        }
        if m.window_size is not None:  # reference registers these only then
            attn["emb_rel_k"] = _t(
                sd[f"encoder.encoder.attn_layers.{i}.emb_rel_k"]
            )
            attn["emb_rel_v"] = _t(
                sd[f"encoder.encoder.attn_layers.{i}.emb_rel_v"]
            )
        enc_layers.append(
            {
                "attn": attn,
                "norm_1": _norm(sd, f"encoder.encoder.norm_layers_1.{i}"),
                "ffn": {
                    "conv_1": _plain_conv(
                        sd, f"encoder.encoder.ffn_layers.{i}.conv_1"
                    ),
                    "conv_2": _plain_conv(
                        sd, f"encoder.encoder.ffn_layers.{i}.conv_2"
                    ),
                },
                "norm_2": _norm(sd, f"encoder.encoder.norm_layers_2.{i}"),
            }
        )
    params["encoder"] = _stack(enc_layers)

    params["proj_m"] = _plain_conv(sd, "encoder.proj_m")
    if not m.mean_only:
        params["proj_s"] = _plain_conv(sd, "encoder.proj_s")

    params["proj_w"] = {
        "conv_1": _plain_conv(sd, "encoder.proj_w.conv_1"),
        "norm_1": _norm(sd, "encoder.proj_w.norm_1"),
        "conv_2": _plain_conv(sd, "encoder.proj_w.conv_2"),
        "norm_2": _norm(sd, "encoder.proj_w.norm_2"),
        "proj": _plain_conv(sd, "encoder.proj_w.proj"),
    }

    blocks = []
    for b in range(n_blocks):
        base = f"decoder.flows.{3 * b}"
        actnorm = {
            "bias": _t(sd[base + ".bias"]).reshape(-1),
            "logs": _t(sd[base + ".logs"]).reshape(-1),
        }
        invconv = {"weight": _t(sd[f"decoder.flows.{3 * b + 1}.weight"])}
        cpl = f"decoder.flows.{3 * b + 2}"
        wn: Params = {
            "in_layers": _stack(
                [_wn_conv(sd, f"{cpl}.wn.in_layers.{j}") for j in range(n_wn_layers)]
            ),
            "res_skip_last": _wn_conv(
                sd, f"{cpl}.wn.res_skip_layers.{n_wn_layers - 1}"
            ),
        }
        if n_wn_layers > 1:
            wn["res_skip"] = _stack(
                [
                    _wn_conv(sd, f"{cpl}.wn.res_skip_layers.{j}")
                    for j in range(n_wn_layers - 1)
                ]
            )
        if m.gin_channels != 0 and f"{cpl}.wn.cond_layer.weight_v" in sd:
            wn["cond"] = _wn_conv(sd, f"{cpl}.wn.cond_layer")
        coupling = {
            "start": _wn_conv(sd, f"{cpl}.start"),
            "end": _plain_conv(sd, f"{cpl}.end"),
            "wn": wn,
        }
        blocks.append({"actnorm": actnorm, "invconv": invconv, "coupling": coupling})
    params["decoder"] = {"blocks": _stack(blocks)}

    if m.n_speakers > 1 and "emb_g.weight" in sd:
        params["emb_g"] = _t(sd["emb_g.weight"])

    return params


def import_torch_opt_state(opt_sd, model_sd, config, params):
    """Map a reference torch.optim.Adam state dict onto our optax state.

    The reference checkpoint stores the Adam state (checkpoint.py:38-46):
    ``{"state": {param_index: {step, exp_avg, exp_avg_sq}}, "param_groups"}``
    keyed by parameter REGISTRATION order, which for the reference model is
    exactly the state-dict key order (no buffers).  The moments live in the
    same parametrization as the weights (weight-norm g/v, conv layout), so
    :func:`import_torch_state_dict`'s per-tensor reorderings apply to them
    verbatim — fine-tuning from a reference checkpoint continues Adam and
    the Noam schedule instead of restarting them.

    Returns the optax chain state, or None (with a warning) when the
    saved state cannot be mapped — the caller then starts Adam fresh.
    """
    try:
        state = opt_sd["state"]
        names = list(model_sd.keys())
        if not state or len(state) != len(names):
            raise ValueError(
                f"optimizer covers {len(state)} of {len(names)} parameters"
            )
        by_name = {names[i]: s for i, s in state.items()}
        # registration order == state-dict key order for the reference model
        # (no buffers); guard that assumption per-tensor — a reordered
        # registration with same-shaped tensors would otherwise silently
        # apply the wrong moments
        for n, s in by_name.items():
            got = tuple(s["exp_avg"].shape)
            want = tuple(model_sd[n].shape)
            if got != want:
                raise ValueError(
                    f"Adam moment shape {got} does not match parameter "
                    f"{n!r} shape {want} — registration order mismatch"
                )
        sd_mu = {n: s["exp_avg"] for n, s in by_name.items()}
        sd_nu = {n: s["exp_avg_sq"] for n, s in by_name.items()}
        steps = {int(s["step"]) for s in by_name.values()}
        if len(steps) != 1:
            raise ValueError(f"per-parameter steps diverge: {sorted(steps)}")
        count = jnp.asarray(steps.pop(), jnp.int32)

        mu = jax.tree_util.tree_map(
            jnp.asarray, import_torch_state_dict(sd_mu, config)
        )
        nu = jax.tree_util.tree_map(
            jnp.asarray, import_torch_state_dict(sd_nu, config)
        )
        tx = make_optimizer(config)
        fresh = tx.init(jax.tree_util.tree_map(jnp.asarray, params))
        # locate states structurally (not by chain position): the Adam state
        # is the one with mu/nu fields; any other counted state (the noam
        # schedule) continues from the same step
        rebuilt = []
        found_adam = False
        for st in fresh:
            fields = getattr(type(st), "_fields", ())
            if "mu" in fields and "nu" in fields:
                st = st._replace(count=count, mu=mu, nu=nu)
                found_adam = True
            elif "count" in fields:
                st = st._replace(count=count)
            rebuilt.append(st)
        if not found_adam:
            raise ValueError("no Adam state in the optimizer chain")
        _LOGGER.info(
            "imported torch Adam state (%s parameters, step=%s)",
            len(names),
            int(count),
        )
        return tuple(rebuilt)
    except (KeyError, ValueError, TypeError, IndexError) as exc:
        # expected mapping failures (changed model schema, partial state);
        # anything else is an importer bug and should surface
        _LOGGER.warning(
            "could not import torch optimizer state (%s); Adam restarts "
            "fresh — fine-tuning still works, moments rebuild over warmup",
            exc,
        )
        return None


# ---------------------------------------------------------------------------
# Torch (.pth) checkpoint EXPORT (the inverse of import_torch_state_dict) —
# lets a migrating user take a TPU-trained model back to the reference
# stack.  The mapping is the exact inverse of the import transforms above:
# conv [k, in, out] -> [out, in, k], weight-norm g [c] -> [out, 1, 1],
# ActNorm [c] -> [1, c, 1], stacked scan params -> per-layer module lists.
# Reference checkpoint contract: checkpoint.py:27-48 (a dict with "model",
# "global_step", "learning_rate", "version", "optimizer").
# ---------------------------------------------------------------------------


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _conv_w_inv(a) -> np.ndarray:
    """ours [k, in, out] -> torch conv weight [out, in, k]."""
    return _np(a).transpose(2, 1, 0)


def _unstack(stacked: dict, i: int) -> dict:
    return jax.tree_util.tree_map(lambda a: a[i], stacked)


def _emit_plain_conv(out, prefix: str, conv) -> None:
    out[prefix + ".weight"] = _conv_w_inv(conv["w"])
    out[prefix + ".bias"] = _np(conv["b"])


def _emit_wn_conv(out, prefix: str, conv) -> None:
    out[prefix + ".weight_v"] = _conv_w_inv(conv["v"])
    out[prefix + ".weight_g"] = _np(conv["g"]).reshape(-1, 1, 1)
    out[prefix + ".bias"] = _np(conv["b"])


def _emit_norm(out, prefix: str, norm) -> None:
    out[prefix + ".gamma"] = _np(norm["gamma"])
    out[prefix + ".beta"] = _np(norm["beta"])


def export_torch_state_dict(params: Params, config: TrainingConfig) -> dict:
    """Our param pytree -> a reference FlowGenerator state dict (numpy
    float32 values; callers wrap in torch tensors at save time).  Exact
    inverse of :func:`import_torch_state_dict` — the roundtrip is
    bit-identical and the output loads into the reference model with
    ``strict=True`` (tests/test_torch_export.py)."""
    m = config.model
    sd: typing.Dict[str, np.ndarray] = {}

    sd["encoder.emb.weight"] = _np(params["emb"])

    if m.prenet and "prenet" in params:
        pre = params["prenet"]
        n_pre = jax.tree_util.tree_leaves(pre["layers"])[0].shape[0]
        for i in range(n_pre):
            layer = _unstack(pre["layers"], i)
            _emit_plain_conv(sd, f"encoder.pre.conv_layers.{i}", layer["conv"])
            _emit_norm(sd, f"encoder.pre.norm_layers.{i}", layer["norm"])
        _emit_plain_conv(sd, "encoder.pre.proj", pre["proj"])

    for i in range(m.n_layers_enc):
        layer = _unstack(params["encoder"], i)
        at = layer["attn"]
        for name in ("q", "k", "v", "o"):
            _emit_plain_conv(
                sd, f"encoder.encoder.attn_layers.{i}.conv_{name}", at[name]
            )
        if m.window_size is not None:  # mha_init only creates these then
            sd[f"encoder.encoder.attn_layers.{i}.emb_rel_k"] = _np(
                at["emb_rel_k"]
            )
            sd[f"encoder.encoder.attn_layers.{i}.emb_rel_v"] = _np(
                at["emb_rel_v"]
            )
        _emit_norm(sd, f"encoder.encoder.norm_layers_1.{i}", layer["norm_1"])
        _emit_plain_conv(
            sd, f"encoder.encoder.ffn_layers.{i}.conv_1", layer["ffn"]["conv_1"]
        )
        _emit_plain_conv(
            sd, f"encoder.encoder.ffn_layers.{i}.conv_2", layer["ffn"]["conv_2"]
        )
        _emit_norm(sd, f"encoder.encoder.norm_layers_2.{i}", layer["norm_2"])

    _emit_plain_conv(sd, "encoder.proj_m", params["proj_m"])
    if not m.mean_only and "proj_s" in params:
        _emit_plain_conv(sd, "encoder.proj_s", params["proj_s"])

    dp = params["proj_w"]
    _emit_plain_conv(sd, "encoder.proj_w.conv_1", dp["conv_1"])
    _emit_norm(sd, "encoder.proj_w.norm_1", dp["norm_1"])
    _emit_plain_conv(sd, "encoder.proj_w.conv_2", dp["conv_2"])
    _emit_norm(sd, "encoder.proj_w.norm_2", dp["norm_2"])
    _emit_plain_conv(sd, "encoder.proj_w.proj", dp["proj"])

    n_wn_layers = m.n_block_layers
    for b in range(m.n_blocks_dec):
        blk = _unstack(params["decoder"]["blocks"], b)
        base = f"decoder.flows.{3 * b}"
        sd[base + ".bias"] = _np(blk["actnorm"]["bias"]).reshape(1, -1, 1)
        sd[base + ".logs"] = _np(blk["actnorm"]["logs"]).reshape(1, -1, 1)
        # NOTE: weight_inv (store_inverse) is a derived cache, not a
        # reference parameter — deliberately not exported
        sd[f"decoder.flows.{3 * b + 1}.weight"] = _np(
            blk["invconv"]["weight"]
        )
        cpl = f"decoder.flows.{3 * b + 2}"
        _emit_wn_conv(sd, f"{cpl}.start", blk["coupling"]["start"])
        _emit_plain_conv(sd, f"{cpl}.end", blk["coupling"]["end"])
        wn = blk["coupling"]["wn"]
        for j in range(n_wn_layers):
            _emit_wn_conv(
                sd, f"{cpl}.wn.in_layers.{j}", _unstack(wn["in_layers"], j)
            )
        for j in range(n_wn_layers - 1):
            _emit_wn_conv(
                sd, f"{cpl}.wn.res_skip_layers.{j}", _unstack(wn["res_skip"], j)
            )
        _emit_wn_conv(
            sd,
            f"{cpl}.wn.res_skip_layers.{n_wn_layers - 1}",
            wn["res_skip_last"],
        )
        if "cond" in wn:
            _emit_wn_conv(sd, f"{cpl}.wn.cond_layer", wn["cond"])

    if m.n_speakers > 1 and "emb_g" in params:
        sd["emb_g.weight"] = _np(params["emb_g"])

    # canonicalize to the reference's REGISTRATION order: torch state dicts
    # carry insertion order, our own .pth importer maps Adam state indices
    # through it, and a reference-saved file has exactly this order
    order = [n for n in _reference_param_order(config) if n in sd]
    assert len(order) == len(sd), sorted(set(sd) - set(order))
    return {k: sd[k] for k in order}


def save_torch_checkpoint(
    checkpoint: Checkpoint, config: TrainingConfig, path: Path
) -> None:
    """Write a reference-compatible ``.pth``: model weights plus a torch
    Adam state dict (real moments when the checkpoint carries them, a
    valid empty state otherwise — the reference loads the optimizer
    unconditionally on resume, checkpoint.py:74-76, so ``None`` would
    crash it)."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(checkpoint.params, config).items()
    }
    torch.save(
        {
            "model": sd,
            "global_step": int(checkpoint.global_step),
            "learning_rate": float(checkpoint.learning_rate),
            "version": int(checkpoint.version),
            "optimizer": export_torch_opt_state(
                checkpoint.opt_state, checkpoint.params, config,
                checkpoint.learning_rate,
            ),
        },
        path,
    )


def _reference_param_order(config: TrainingConfig) -> typing.List[str]:
    """Reference FlowGenerator parameter names in REGISTRATION order (which
    is also torch state_dict key order and ``model.parameters()`` order —
    what ``torch.optim.Adam`` state indices refer to).

    Derived from the reference module definition order: FlowGenerator =
    encoder, decoder, emb_g (models.py:275-308); TextEncoder = emb, pre,
    encoder, proj_m, proj_s, proj_w (models.py:87-110); Encoder's four
    ModuleLists in attribute order (attentions.py:23-27); MHA registers
    emb_rel_k/v as own Parameters BEFORE its conv children appear in the
    walk (attentions.py:175-189); weight-normed convs order as
    (bias, weight_g, weight_v) because weight_norm deletes 'weight' and
    appends g/v; ActNorm registers logs then bias (layers.py:7-8); WN =
    in_layers, res_skip_layers, cond_layer (layers.py:105-113).
    Verified against the live reference model in tests/test_torch_export.py.
    """
    m = config.model
    names: typing.List[str] = ["encoder.emb.weight"]

    def plain(prefix):
        return [prefix + ".weight", prefix + ".bias"]

    def normed(prefix):
        return [prefix + ".gamma", prefix + ".beta"]

    def wn_conv(prefix):
        return [prefix + ".bias", prefix + ".weight_g", prefix + ".weight_v"]

    if m.prenet:
        for i in range(3):
            names += plain(f"encoder.pre.conv_layers.{i}")
        for i in range(3):
            names += normed(f"encoder.pre.norm_layers.{i}")
        names += plain("encoder.pre.proj")

    for i in range(m.n_layers_enc):
        p = f"encoder.encoder.attn_layers.{i}"
        if m.window_size is not None:
            names += [p + ".emb_rel_k", p + ".emb_rel_v"]
        for c in ("conv_q", "conv_k", "conv_v", "conv_o"):
            names += plain(f"{p}.{c}")
    for i in range(m.n_layers_enc):
        names += normed(f"encoder.encoder.norm_layers_1.{i}")
    for i in range(m.n_layers_enc):
        names += plain(f"encoder.encoder.ffn_layers.{i}.conv_1")
        names += plain(f"encoder.encoder.ffn_layers.{i}.conv_2")
    for i in range(m.n_layers_enc):
        names += normed(f"encoder.encoder.norm_layers_2.{i}")

    names += plain("encoder.proj_m")
    if not m.mean_only:
        names += plain("encoder.proj_s")
    names += plain("encoder.proj_w.conv_1")
    names += normed("encoder.proj_w.norm_1")
    names += plain("encoder.proj_w.conv_2")
    names += normed("encoder.proj_w.norm_2")
    names += plain("encoder.proj_w.proj")

    for b in range(m.n_blocks_dec):
        names += [f"decoder.flows.{3 * b}.logs", f"decoder.flows.{3 * b}.bias"]
        names += [f"decoder.flows.{3 * b + 1}.weight"]
        cpl = f"decoder.flows.{3 * b + 2}"
        names += wn_conv(f"{cpl}.start")
        names += plain(f"{cpl}.end")
        for j in range(m.n_block_layers):
            names += wn_conv(f"{cpl}.wn.in_layers.{j}")
        for j in range(m.n_block_layers):
            names += wn_conv(f"{cpl}.wn.res_skip_layers.{j}")
        if m.gin_channels != 0:
            names += wn_conv(f"{cpl}.wn.cond_layer")

    if m.n_speakers > 1:
        names.append("emb_g.weight")
    return names


def export_torch_opt_state(
    opt_state, params: Params, config: TrainingConfig, learning_rate: float
) -> dict:
    """Our optax Adam state -> a torch.optim.Adam state dict the reference
    resumes from (inverse of :func:`import_torch_opt_state`).  When
    ``opt_state`` is None (or has no Adam moments), returns a valid
    EMPTY-state dict — torch accepts it and rebuilds moments, and the
    reference's resume path no longer crashes on ``optimizer=None``
    (reference checkpoint.py:74-76 loads it unconditionally)."""
    import torch

    order = _reference_param_order(config)
    groups = [{
        "lr": float(learning_rate),
        "betas": tuple(config.betas),
        "eps": float(config.eps),
        "weight_decay": 0,
        "amsgrad": False,
        "maximize": False,
        "foreach": None,
        "capturable": False,
        "differentiable": False,
        "fused": None,
        "params": list(range(len(order))),
    }]

    mu = nu = count = None
    for st in opt_state or ():
        fields = getattr(type(st), "_fields", ())
        if "mu" in fields and "nu" in fields:
            mu, nu, count = st.mu, st.nu, st.count
    if mu is None or int(np.asarray(count)) == 0:
        # never-stepped state (e.g. a weights-only checkpoint loaded with a
        # fresh tx.init) — torch's own convention for an unstepped Adam is
        # an EMPTY state dict, and zeroed moments at step 0 are equivalent
        return {"state": {}, "param_groups": groups}

    mu_sd = export_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, mu), config
    )
    nu_sd = export_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, nu), config
    )
    step = torch.tensor(float(np.asarray(count)))
    state = {
        i: {
            "step": step.clone(),
            "exp_avg": torch.from_numpy(np.ascontiguousarray(mu_sd[name])),
            "exp_avg_sq": torch.from_numpy(np.ascontiguousarray(nu_sd[name])),
        }
        for i, name in enumerate(order)
    }
    return {"state": state, "param_groups": groups}
