"""Network parity tests against the reference torch modules.

The reference's extractor.py / gru.py import only torch, so we can load
them as *oracles* (never copying code): random torch weights are converted
with models.weights and outputs compared.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

from nerf_slam_tpu.models import (BasicEncoder, ConvGRU, UpdateModule,
                                  DroidNet, weights)

torch = pytest.importorskip("torch")


def to_flax_subdict(torch_module, prefix=""):
    sd = {prefix + k: v.detach().numpy()
          for k, v in torch_module.state_dict().items()}
    return sd


def test_basic_encoder_parity_instance_norm():
    from networks.modules.extractor import BasicEncoder as TorchEncoder
    torch.manual_seed(0)
    tenc = TorchEncoder(output_dim=128, norm_fn="instance").eval()

    sd = to_flax_subdict(tenc, "feature_net.")
    params = weights.convert(sd)["params"]["feature_net"]

    enc = BasicEncoder(output_dim=128, norm="instance")
    x = np.random.RandomState(1).randn(2, 64, 96, 3).astype(np.float32)

    out = enc.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))[None]
        tout = tenc(tx).numpy()[0].transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(out), tout, atol=2e-4)


def test_basic_encoder_parity_none_norm():
    from networks.modules.extractor import BasicEncoder as TorchEncoder
    torch.manual_seed(2)
    tenc = TorchEncoder(output_dim=256, norm_fn="none").eval()
    sd = to_flax_subdict(tenc, "context_net.")
    params = weights.convert(sd)["params"]["context_net"]
    enc = BasicEncoder(output_dim=256, norm="none")
    x = np.random.RandomState(3).randn(1, 48, 64, 3).astype(np.float32)
    out = enc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))[None]
        tout = tenc(tx).numpy()[0].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), tout, atol=2e-4)


def test_conv_gru_parity():
    from networks.modules.gru import ConvGRU as TorchGRU
    torch.manual_seed(4)
    tgru = TorchGRU(h_planes=128, i_planes=320).eval()

    sd = {"update_net.gru." + k: v.detach().numpy()
          for k, v in tgru.state_dict().items()}
    params = weights.convert(sd)["params"]["update_net"]["gru"]

    gru = ConvGRU(128, 320)
    rng = np.random.RandomState(5)
    net = rng.randn(2, 8, 12, 128).astype(np.float32)
    inp = rng.randn(2, 8, 12, 320).astype(np.float32)

    out = gru.apply({"params": params}, jnp.asarray(net), jnp.asarray(inp))

    with torch.no_grad():
        tnet = torch.from_numpy(net.transpose(0, 3, 1, 2))
        tinp = torch.from_numpy(inp.transpose(0, 3, 1, 2))
        tout = tgru(tnet, tinp).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(out), tout, atol=2e-4)


def test_update_hoisted_context_gates_match_legacy():
    """The split-kernel GRU path (context gate constants hoisted out of
    the iteration loop, frontend.py hot loop) must match the monolithic
    conv path: exactly in f32, to bf16 rounding in bf16."""
    for dtype, tol in ((None, 1e-5), (jnp.bfloat16, 2e-2)):
        um = UpdateModule(dtype=dtype)
        rng = np.random.RandomState(11)
        E, H, W = 3, 8, 16
        net = jnp.asarray(rng.randn(E, H, W, 128).astype(np.float32))
        inp = jnp.asarray(rng.randn(E, H, W, 128).astype(np.float32))
        corr = jnp.asarray(
            0.1 * rng.randn(E, H, W, 196).astype(np.float32))
        flow = jnp.asarray(rng.randn(E, H, W, 4).astype(np.float32))
        seg = jnp.array([0, 0, 1])
        if dtype is not None:
            net, inp = net.astype(dtype), inp.astype(dtype)
            corr, flow = corr.astype(dtype), flow.astype(dtype)
        params = um.init(jax.random.PRNGKey(3), net, inp, corr, flow,
                         seg, 2)
        ref = um.apply(params, net, inp, corr, flow, seg, 2)
        gates = um.apply(params, inp, method=UpdateModule.precompute_inp)
        fast = um.apply(params, net, inp, corr, flow, seg, 2,
                        gates_inp=gates)
        # compute dtype must be preserved (bf16 hidden stays bf16 --
        # the frontend's while_loop carry depends on it)
        assert fast[0].dtype == ref[0].dtype
        for a, b in zip(ref, fast):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=tol, rtol=tol)


def test_update_module_shapes_and_init():
    um = UpdateModule()
    rng = jax.random.PRNGKey(0)
    E, H, W = 3, 8, 10
    net = jnp.zeros((E, H, W, 128))
    inp = jnp.zeros((E, H, W, 128))
    corr = jnp.zeros((E, H, W, 196))
    flow = jnp.zeros((E, H, W, 4))
    seg = jnp.array([0, 0, 1])
    params = um.init(rng, net, inp, corr, flow, seg, 2)
    net2, delta, weight, eta, upmask = um.apply(
        params, net, inp, corr, flow, seg, 2)
    assert net2.shape == (E, H, W, 128)
    assert delta.shape == (E, H, W, 2)
    assert weight.shape == (E, H, W, 2)
    assert eta.shape == (2, H, W)
    assert upmask.shape == (2, H, W, 576)
    assert bool(jnp.all(weight >= 0)) and bool(jnp.all(weight <= 1))
    assert bool(jnp.all(eta >= 0))

    # no-agg variant (motion filter path)
    out3 = um.apply(params, net, inp, corr)
    assert len(out3) == 3


def test_droidnet_param_tree_matches_droid_pth_keys():
    """The converter must cover every key pattern a real droid.pth has.
    We synthesize a state dict from the reference module names."""
    from networks.modules.extractor import BasicEncoder as TorchEncoder
    from networks.modules.gru import ConvGRU as TorchGRU
    import torch.nn as tnn

    torch.manual_seed(6)

    # reconstruct the update-module param *names* via small torch stubs
    f = TorchEncoder(output_dim=128, norm_fn="instance")
    c = TorchEncoder(output_dim=256, norm_fn="none")
    gru = TorchGRU(128, 320)

    sd = {}
    sd.update({"module.fnet." + k: v.numpy()
               for k, v in f.state_dict().items()})
    sd.update({"module.cnet." + k: v.numpy()
               for k, v in c.state_dict().items()})
    sd.update({"module.update.gru." + k: v.numpy()
               for k, v in gru.state_dict().items()})

    def conv_sd(name, cin, cout, k):
        m = tnn.Conv2d(cin, cout, k, padding=k // 2)
        return {f"module.update.{name}.weight": m.weight.detach().numpy(),
                f"module.update.{name}.bias": m.bias.detach().numpy()}

    for spec in [("corr_encoder.0", 196, 128, 1),
                 ("corr_encoder.2", 128, 128, 3),
                 ("flow_encoder.0", 4, 128, 7),
                 ("flow_encoder.2", 128, 64, 3),
                 ("weight.0", 128, 128, 3), ("weight.2", 128, 3, 3),
                 ("delta.0", 128, 128, 3), ("delta.2", 128, 3, 3),
                 ("agg.conv1", 128, 128, 3), ("agg.conv2", 128, 128, 3),
                 ("agg.eta.0", 128, 1, 3), ("agg.upmask.0", 128, 576, 1)]:
        sd.update(conv_sd(*spec))

    converted = weights.convert(sd)

    # init the flax net and compare tree structure
    dn = DroidNet()
    imgs = jnp.zeros((1, 64, 96, 3))
    E, H, W = 2, 8, 12
    params = dn.init(jax.random.PRNGKey(0), imgs,
                     jnp.zeros((E, H, W, 128)), jnp.zeros((E, H, W, 128)),
                     jnp.zeros((E, H, W, 196)), jnp.zeros((E, H, W, 4)),
                     jnp.array([0, 1]), 2)

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k,))
        return out

    want = paths(params["params"])
    got = paths(converted["params"])
    assert want == got, (sorted(want - got)[:5], sorted(got - want)[:5])

    # shapes must match too (incl. truncated heads)
    def leaves(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from leaves(v, prefix + (k,))
            else:
                yield prefix + (k,), v

    wmap = dict(leaves(params["params"]))
    for path, arr in leaves(converted["params"]):
        assert wmap[path].shape == arr.shape, (path, wmap[path].shape,
                                               arr.shape)
