"""Round-trip test for the torch-checkpoint importer.

flax variables -> torch twin (tests/test_reference_parity.py transplant)
-> REFERENCE-named state dict (reference models.py module tree:
``ds_modules.{i}.conv_blocks.{j}.{0,1}``, ``bg``, ``us_modules``,
``top_layer``, ``reshape``, ``attention_module``; job_runner.py:707-716
save format) -> ``torch.save`` -> tools/import_torch_checkpoint ->
identical flax variables and identical dense logits through the full
model apply.  This proves any real reference ``.pth`` can be evaluated
through the TPU pipeline.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dram_tpu.models import DC3D, DC3DATGeneric
from dram_tpu.train.checkpoint import load_checkpoint, tolerant_merge
from dram_tpu.train.torch_import import (convert_state_dict,
                                         import_torch_checkpoint)

from test_reference_parity import (SMALL, TorchRefDC3D, TorchRefDC3DAT,
                                   transplant_dc3d, transplant_dc3d_at)

AT_SMALL = dict(at_layers=(-1, 0), at_f_dim=4, at_g_dim=4,
                at_spatial_size=(12, 12, 12), at_p_enc_dim=0,
                at_geo_f_dim=0, at_g_iter=1, at_k_size=3,
                at_merge_type="scaled_dot_product_relu",
                at_self_loop=False, at_connectivity=2)


def _ref_named(sd, is_at):
    """Twin state-dict keys -> reference module names.

    The twin flattens each conv stack into one Sequential
    ([conv,bn,relu]x2 -> indices 3j, 3j+1); the reference nests them as
    ``conv_blocks.{j}.{0,1}`` inside ConvPoolBlock5d/ConvBlock5d/
    UpsampleConvBlock5d (parts.py:66-196) under ``ds_modules``/``bg``/
    ``us_modules``, with the 1x1 head at ``top_layer`` (models.py:80-111).
    """
    out = {}
    for k, v in sd.items():
        p = k.split(".")
        if p[0] in ("ds", "us"):
            flat = int(p[2])
            out[f"{p[0]}_modules.{p[1]}.conv_blocks.{flat // 3}."
                f"{flat % 3}.{p[3]}"] = v
        elif p[0] == "bg":
            flat = int(p[1])
            out[f"bg.conv_blocks.{flat // 3}.{flat % 3}.{p[2]}"] = v
        elif p[0] == "top":
            out[f"top_layer.{p[1]}"] = v
        elif p[0] == "reshape":
            out[k] = v  # same name in the reference (models.py:488)
        else:
            raise AssertionError(f"unmapped twin key {k}")
    # the reference registers a requires-grad dummy used by the
    # checkpoint() trick (models.py:111); importers must skip it
    out["dummy"] = torch.ones(1)
    return out


def _assert_tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=0, rtol=0, err_msg=f"{path}/{k}")


def _to_plain(tree):
    return jax.tree.map(lambda x: np.asarray(x, np.float32), tree)


class TestTorchImport:

    def test_dc3d_roundtrip(self, rng, tmp_path):
        model = DC3D(**SMALL, train=False)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(3), x)
        # give running stats non-trivial values so the import is checked
        variables = jax.tree.map(
            lambda a: a + 0.1 * np.arange(a.size, dtype=np.float32)
            .reshape(a.shape) / a.size, variables)

        tmodel = TorchRefDC3D(**SMALL)
        transplant_dc3d(tmodel, variables["params"],
                        variables["batch_stats"])
        sd = _ref_named(tmodel.state_dict(), is_at=False)
        pth = tmp_path / "ref.pth"
        torch.save({"epoch": 7, "iteration": 123, "model": sd,
                    "optimizer": {}, "metrics": {}}, pth)

        state = import_torch_checkpoint(str(pth), str(tmp_path / "out.ckpt"))
        assert state["epoch"] == 7 and state["iteration"] == 123
        _assert_tree_equal(_to_plain(variables["params"]),
                           state["model"]["params"])
        _assert_tree_equal(_to_plain(variables["batch_stats"]),
                           state["model"]["batch_stats"])

        # the written .ckpt restores through the tolerant merge to the
        # exact same tree
        saved = load_checkpoint(str(tmp_path / "out.ckpt"))
        merged = tolerant_merge(
            {"params": _to_plain(variables["params"]),
             "batch_stats": _to_plain(variables["batch_stats"])},
            saved["model"])
        _assert_tree_equal(merged["params"], _to_plain(variables["params"]))

        # identical masks end to end: logits through the flax model with
        # imported weights == logits with the original weights
        y0, _ = model.apply(variables, x)
        y1, _ = model.apply(
            {"params": state["model"]["params"],
             "batch_stats": state["model"]["batch_stats"]}, x)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_dc3dat_roundtrip(self, rng, tmp_path):
        model = DC3DATGeneric(**SMALL, **AT_SMALL, train=False)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(4), x)

        tmodel = TorchRefDC3DAT(
            at_layers=AT_SMALL["at_layers"], at_f_dim=AT_SMALL["at_f_dim"],
            at_spatial_size=AT_SMALL["at_spatial_size"], **SMALL)
        transplant_dc3d_at(tmodel, variables["params"],
                           variables["batch_stats"])
        sd = {}
        for k, v in tmodel.state_dict().items():
            sd[k] = v
        named = _ref_named(
            {k: v for k, v in sd.items() if not k.startswith("reshape")},
            is_at=True)
        # backbone keys + tap heads + PCM linears (torch Linear stores
        # (out,in); the flax Dense kernel is its transpose)
        for k, v in sd.items():
            if k.startswith("reshape"):
                named[k] = v
        for nm in ("theta", "phi", "G", "r"):
            fp = variables["params"]["attention_module"][nm]
            named[f"attention_module.{nm}.weight"] = torch.from_numpy(
                np.asarray(fp["kernel"], np.float32).T.copy())
            named[f"attention_module.{nm}.bias"] = torch.from_numpy(
                np.asarray(fp["bias"], np.float32).copy())
        pth = tmp_path / "ref_at.pth"
        torch.save(named, pth)  # bare state dict form

        state = import_torch_checkpoint(str(pth),
                                        str(tmp_path / "out_at.ckpt"))
        _assert_tree_equal(_to_plain(variables["params"]),
                           state["model"]["params"])
        _assert_tree_equal(_to_plain(variables["batch_stats"]),
                           state["model"]["batch_stats"])

        d0, r0 = model.apply(variables, x)
        d1, r1 = model.apply(
            {"params": state["model"]["params"],
             "batch_stats": state["model"]["batch_stats"]}, x)
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    def test_unknown_keys_skipped(self, tmp_path):
        sd = {"totally.new.module.weight": torch.zeros(3),
              "top_layer.weight": torch.zeros(1, 4, 1, 1, 1),
              "dummy": torch.ones(1)}
        logged = []
        params, stats = convert_state_dict(sd, log=logged.append)
        assert "top_layer" in params and not stats
        assert any("totally.new.module.weight" in m for m in logged)
        assert not any("dummy" in m for m in logged)
