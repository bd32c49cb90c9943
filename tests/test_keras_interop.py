"""Reference-artifact interop (VERDICT r2 item 4): a Keras ``weights.hdf5``
and a reference ``model.pickle`` (written by /root/reference/dca/network.py:
158-167) must import directly.  Fixtures are built in the exact Keras-2 HDF5
save_weights layout (root attr ``layer_names``, per-layer ``weight_names``)
and the reference's whole-object pickle shape."""

import pickle
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from dca_tpu.models import AE_types
from dca_tpu.models.network import load_model


def _keras_weight_file(path, net, seed=0):
    """Write net-compatible random weights as a Keras-2 weights.hdf5.

    Returns the weight arrays keyed the same way the pytree is, so the test
    can install them directly on a control network."""
    import h5py

    rs = np.random.RandomState(seed)
    defn = net.definition
    trunk = list(defn.shared)
    layer_entries = []  # (keras_layer_name, {weight_name: array})
    assigned = {"trunk": {}, "branches": {}, "heads": {}}

    layer_entries.append(("count", {}))
    bn_counter = [0]

    def _dense_entries(layers, sink):
        for ld in layers:
            k = rs.normal(scale=0.1, size=(ld.in_dim, ld.units)).astype(np.float32)
            b = rs.normal(scale=0.1, size=(ld.units,)).astype(np.float32)
            sink[ld.name] = {"kernel": k, "bias": b}
            layer_entries.append(
                (ld.name, {f"{ld.name}/kernel:0": k, f"{ld.name}/bias:0": b})
            )
            if ld.batchnorm:
                bn_counter[0] += 1
                bname = f"batch_normalization_{bn_counter[0]}"
                beta = rs.normal(scale=0.1, size=(ld.units,)).astype(np.float32)
                mm = rs.normal(scale=0.1, size=(ld.units,)).astype(np.float32)
                mv = rs.uniform(0.5, 2.0, size=(ld.units,)).astype(np.float32)
                sink[ld.name].update(bn_beta=beta, moving_mean=mm, moving_var=mv)
                layer_entries.append(
                    (bname, {
                        f"{bname}/beta:0": beta,
                        f"{bname}/moving_mean:0": mm,
                        f"{bname}/moving_variance:0": mv,
                    })
                )
            layer_entries.append((f"{ld.name}_act", {}))

    _dense_entries(trunk, assigned["trunk"])
    for bname_, layers in getattr(defn, "branches", {}).items():
        assigned["branches"][bname_] = {}
        _dense_entries(layers, assigned["branches"][bname_])

    for hname, head in defn.heads.items():
        if head.kind == "constant":
            th = rs.normal(scale=0.1, size=(1, head.units)).astype(np.float32)
            assigned["heads"][hname] = {"theta": th}
            layer_entries.append((head.name, {f"{head.name}/theta:0": th}))
        elif head.kind == "elementwise":
            k = rs.normal(scale=0.1, size=(head.units,)).astype(np.float32)
            b = rs.normal(scale=0.1, size=(head.units,)).astype(np.float32)
            assigned["heads"][hname] = {"kernel": k, "bias": b}
            layer_entries.append(
                (head.name, {f"{head.name}/kernel:0": k, f"{head.name}/bias:0": b})
            )
        else:
            k = rs.normal(scale=0.1, size=(head.in_dim, head.units)).astype(np.float32)
            b = rs.normal(scale=0.1, size=(head.units,)).astype(np.float32)
            assigned["heads"][hname] = {"kernel": k, "bias": b}
            layer_entries.append(
                (head.name, {f"{head.name}/kernel:0": k, f"{head.name}/bias:0": b})
            )
    layer_entries.append(("size_factors", {}))
    layer_entries.append(("slice", {}))

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n, _ in layer_entries])
        for lname, weights in layer_entries:
            g = f.create_group(lname)
            g.attrs["weight_names"] = np.array([w.encode() for w in weights])
            for wname, arr in weights.items():
                g.create_dataset(wname, data=arr)
    return assigned


def _install(net, assigned):
    """Set the generated weights directly on a control network's pytree."""
    params = {k: {} for k in ("trunk", "branches", "heads")}
    state = {"trunk": {}, "branches": {}, "heads": {}}
    pt, st = dict(net.params), dict(net.state)

    def _fill(sink_p, sink_s, src, cur_p, cur_s):
        for lname, w in src.items():
            p = dict(cur_p[lname])
            s = dict(cur_s.get(lname, {}))
            for leaf in ("kernel", "bias", "theta"):
                if leaf in w:
                    p[leaf] = jnp.asarray(w[leaf])
            if "bn_beta" in w:
                p["bn_beta"] = jnp.asarray(w["bn_beta"])
                s["moving_mean"] = jnp.asarray(w["moving_mean"])
                s["moving_var"] = jnp.asarray(w["moving_var"])
            sink_p[lname] = p
            sink_s[lname] = s

    _fill(params["trunk"], state["trunk"], assigned["trunk"],
          pt["trunk"], st["trunk"])
    for b, src in assigned["branches"].items():
        params["branches"][b] = {}
        state["branches"][b] = {}
        _fill(params["branches"][b], state["branches"][b], src,
              pt["branches"][b], st["branches"][b])
    _fill(params["heads"], state["heads"], assigned["heads"],
          pt["heads"], {h: {} for h in pt["heads"]})
    net.params = {"trunk": params["trunk"], "branches": params["branches"],
                  "heads": params["heads"]}
    net.state = {"trunk": state["trunk"], "branches": state["branches"]}
    net._predict_jit = None


@pytest.mark.parametrize("ae_type", ["nb-conddisp", "zinb-conddisp", "nb",
                                     "zinb-fork"])
def test_keras_weights_hdf5_roundtrip(tmp_path, ae_type):
    """Loading a Keras-layout weights.hdf5 must reproduce the exact forward
    outputs of a network carrying those weights."""
    from dca_tpu.models import core

    path = str(tmp_path / "weights.hdf5")
    net = AE_types[ae_type](input_size=40, hidden_size=(12, 6, 12), seed=0)
    net.build()
    assigned = _keras_weight_file(path, net, seed=3)

    control = AE_types[ae_type](input_size=40, hidden_size=(12, 6, 12), seed=0)
    control.build()
    _install(control, assigned)

    loaded = AE_types[ae_type](input_size=40, hidden_size=(12, 6, 12), seed=1)
    loaded.build()
    loaded.load_weights(path)

    rs = np.random.RandomState(0)
    x = rs.normal(size=(9, 40)).astype(np.float32)
    sf = rs.uniform(0.5, 2.0, size=(9,)).astype(np.float32)
    want, _ = core.apply(control.definition, control.params, control.state,
                         x, sf, training=False)
    got, _ = core.apply(loaded.definition, loaded.params, loaded.state,
                        x, sf, training=False)
    for k in ("output", "mean", "disp", "pi", "latent"):
        if want[k] is None:
            assert got[k] is None
            continue
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)


def test_keras_weights_wrong_arch_raises(tmp_path):
    path = str(tmp_path / "weights.hdf5")
    src = AE_types["zinb-conddisp"](input_size=40, hidden_size=(12, 6, 12))
    src.build()
    _keras_weight_file(path, src)
    dst = AE_types["nb-conddisp"](input_size=40, hidden_size=(12, 6, 12))
    dst.build()
    with pytest.raises(ValueError, match="pi"):
        dst.load_weights(path)


def test_reference_model_pickle_loads(tmp_path):
    """A model.pickle holding the reference's pre-build Keras object (whose
    classes are NOT importable here) must reconstruct the right network."""
    mod = types.ModuleType("dca.network")

    class ZINBAutoencoder:  # stand-in for the reference class
        pass

    ZINBAutoencoder.__module__ = "dca.network"
    ZINBAutoencoder.__qualname__ = "ZINBAutoencoder"
    mod.ZINBAutoencoder = ZINBAutoencoder
    pkg = types.ModuleType("dca")
    pkg.network = mod
    sys.modules["dca"] = pkg
    sys.modules["dca.network"] = mod
    try:
        obj = ZINBAutoencoder()
        obj.__dict__.update(
            input_size=55, output_size=55, hidden_size=(16, 8, 16),
            l2_coef=0.0, l1_coef=0.0, l2_enc_coef=0.0, l1_enc_coef=0.0,
            ridge=0.2, hidden_dropout=0.0, input_dropout=0.0,
            batchnorm=True, activation="relu", init="glorot_uniform",
            file_path=None, debug=False,
            # reference-only attrs that must be ignored
            loss=None, extra_models={}, model=None, encoder=None,
            decoder=None, input_layer=None, sf_layer=None,
        )
        path = str(tmp_path / "model.pickle")
        with open(path, "wb") as f:
            pickle.dump(obj, f)
    finally:
        del sys.modules["dca"], sys.modules["dca.network"]

    net = load_model(path)
    assert net.ae_type == "zinb-conddisp"
    assert net.input_size == 55
    assert net.hidden_size == (16, 8, 16)
    assert net.ridge == 0.2
    assert net.params is not None  # built and ready for load_weights


def test_own_model_pickle_still_loads(tmp_path):
    net = AE_types["nb"](input_size=20, hidden_size=(8, 4, 8),
                         file_path=str(tmp_path))
    net.build()
    net.save()
    out = load_model(str(tmp_path / "model.pickle"))
    assert out.ae_type == "nb"
    assert out.input_size == 20
