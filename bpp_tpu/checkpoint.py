"""Checkpoint / resume (src/dump.c, src/load.c analog).

Format: a single ``.npz`` holding every leaf of the MCMC state pytree
(path-named), the PRNG key, host-side counters, and the control-file
text, plus the mcmc.txt byte offset for exactly-once resumption
(``checkpoint_truncate`` load.c:2319: on resume the sample file is
truncated to the stored offset so no sample is duplicated or lost).

Unlike the reference's binary "BPPX" format, CLVs are never stored
here either — they are derived state (the reference also rebuilds
them, load.c:1961).  Sequence data files must still be present at
their original paths on resume (the npz stores the ctl text, not the
alignments).
"""

from __future__ import annotations

import json

import jax
import numpy as np

FORMAT_VERSION = 1


def _flatten_state(state):
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    out = {}
    for path, leaf in leaves:
        name = "".join(str(p) for p in path)
        out[f"state{name}"] = np.asarray(leaf)
    return out


def save_checkpoint(path, state, key, it, stats_acc, *, cfg_text,
                    seed, mcmc_offset, extra=None):
    meta = {
        "version": FORMAT_VERSION,
        "it": int(it),
        "seed": int(seed),
        "mcmc_offset": int(mcmc_offset),
        "extra": extra or {},
    }
    arrays = _flatten_state(state)
    arrays["prng_key"] = np.asarray(key)
    arrays["stats_acc"] = np.asarray(stats_acc)
    np.savez_compressed(path, __meta__=json.dumps(meta),
                        __ctl__=cfg_text, **arrays)


def save_checkpoint_multi(path, states, key, it, stats_acc, logs, *,
                          cfg_text, seed):
    """Chain-batch (chains = K) checkpoint: the stacked state pytree
    plus the accumulated per-chain sample history (the batch writes its
    mcmc files only at the end of the run, so carrying the history in
    the checkpoint gives exactly-once output with no offset
    truncation)."""
    meta = {
        "version": FORMAT_VERSION,
        "it": int(it),
        "seed": int(seed),
        "mcmc_offset": 0,
        "multichain": len(logs),
        "extra": {},
    }
    arrays = _flatten_state(states)
    arrays["prng_key"] = np.asarray(key)
    arrays["stats_acc"] = np.asarray(stats_acc)
    if logs[0].gen:
        arrays["log_gen"] = np.asarray(logs[0].gen)
        arrays["log_theta"] = np.stack(
            [np.stack(lg.theta) for lg in logs])
        arrays["log_tau"] = np.stack([np.stack(lg.tau) for lg in logs])
        arrays["log_lnl"] = np.asarray([lg.lnL for lg in logs])
        arrays["log_logpr"] = np.asarray([lg.logpr for lg in logs])
        if logs[0].phi:
            arrays["log_phi"] = np.stack(
                [np.stack(lg.phi) for lg in logs])
        if logs[0].migM:
            arrays["log_migM"] = np.stack(
                [np.stack(lg.migM) for lg in logs])
        if logs[0].mubar:
            arrays["log_mubar"] = np.asarray(
                [lg.mubar for lg in logs])
    np.savez_compressed(path, __meta__=json.dumps(meta),
                        __ctl__=cfg_text, **arrays)


def restore_logs(arrays, n_chains, make_log):
    """Rebuild the per-chain SampleLog list stored by
    :func:`save_checkpoint_multi` (``make_log`` constructs an empty
    log, keeping this module free of driver imports)."""
    logs = [make_log() for _ in range(n_chains)]
    if "log_gen" not in arrays:
        return logs
    gens = arrays["log_gen"]
    for c, lg in enumerate(logs):
        lg.gen = [int(g) for g in gens]
        lg.theta = list(arrays["log_theta"][c])
        lg.tau = list(arrays["log_tau"][c])
        lg.lnL = [float(x) for x in arrays["log_lnl"][c]]
        lg.logpr = [float(x) for x in arrays["log_logpr"][c]]
        if "log_phi" in arrays:
            lg.phi = list(arrays["log_phi"][c])
        if "log_migM" in arrays:
            lg.migM = list(arrays["log_migM"][c])
        if "log_mubar" in arrays:
            lg.mubar = [float(x) for x in arrays["log_mubar"][c]]
    return logs


def load_checkpoint(path):
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['version']}")
    arrays = {k: z[k] for k in z.files
              if k not in ("__meta__", "__ctl__")}
    return meta, str(z["__ctl__"]), arrays


def restore_state(template_state, arrays, dtype=None):
    """Rebuild the state pytree from named arrays using a template built
    by Engine.init_state() under the same config."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template_state)
    leaves = []
    for path, tmpl in paths:
        name = "state" + "".join(str(p) for p in path)
        if name not in arrays:
            raise ValueError(f"checkpoint missing leaf {name}")
        arr = arrays[name]
        if arr.shape != np.asarray(tmpl).shape:
            raise ValueError(
                f"checkpoint leaf {name} shape {arr.shape} != expected "
                f"{np.asarray(tmpl).shape} (different data/config?)")
        leaves.append(jax.numpy.asarray(arr, np.asarray(tmpl).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def truncate_file(path, offset):
    """Exactly-once logging: cut the sample file back to the offset the
    checkpoint was taken at (load.c:2319)."""
    try:
        with open(path, "r+b") as fh:
            fh.truncate(offset)
    except FileNotFoundError:
        pass
