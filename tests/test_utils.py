"""Utils tests: checkpointer roundtrip, torch DLA-34 import, gen_data
interchange roundtrip, metrics."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.utils.metrics import MetricLogger, SmoothedValue
from dcd_tpu.utils.registry import Registry


def test_registry():
    r = Registry()

    @r.register("foo")
    def foo():
        return 1

    assert r["foo"]() == 1
    with pytest.raises(AssertionError):
        r.register("foo", foo)


def test_smoothed_value():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4]:
        v.update(x)
    assert v.value == 4
    assert v.avg == 3.0  # window [2,3,4]
    assert v.global_avg == 2.5


def test_metric_logger():
    m = MetricLogger()
    m.update(loss=1.0, acc=0.5)
    m.update(loss=2.0, acc=0.7)
    assert abs(m.loss.avg - 1.5) < 1e-9
    assert "loss" in str(m)


@pytest.fixture(scope="module")
def tiny_state():
    from dcd_tpu.engine.train import create_train_state

    cfg = dgde_run_config()
    cfg = dataclasses.replace(
        cfg,
        input=dataclasses.replace(cfg.input, height_train=32, width_train=64),
        datasets=dataclasses.replace(cfg.datasets, max_objects=4),
        model=dataclasses.replace(
            cfg.model,
            head=dataclasses.replace(cfg.model.head, num_channel=16, pairs_topk=64),
            backbone=dataclasses.replace(cfg.model.backbone, channels=(4, 8, 8, 8, 8, 8)),
        ),
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, model, state


def test_checkpoint_roundtrip(tmp_path, tiny_state):
    from dcd_tpu.utils.checkpoint import Checkpointer

    cfg, model, state = tiny_state
    ck = Checkpointer(str(tmp_path / "ckpt"))
    state2 = state.replace(step=state.step + 7)
    ck.save("model_7", state2)
    assert ck.has_checkpoint()
    restored = ck.load(state)
    assert int(restored.step) == 7
    a = jax.tree.leaves(state2.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_dla34_import():
    """Build a torch DLA-34, export its state dict, import into flax, and
    check activation-level agreement of the backbone trunk."""
    import torch
    import torch.nn as torch_nn

    from dcd_tpu.models.dla import DLA
    from dcd_tpu.utils.checkpoint import import_torch_dla34

    # construct a minimal torch DLA-34 trunk matching the reference
    # structure (dla_dcn.py:263-332) to produce a real state dict
    torch.manual_seed(0)

    class TBasicBlock(torch_nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = torch_nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = torch_nn.BatchNorm2d(cout)
            self.conv2 = torch_nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = torch_nn.BatchNorm2d(cout)

        def forward(self, x, residual=None):
            if residual is None:
                residual = x
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + residual)

    class TRoot(torch_nn.Module):
        def __init__(self, cin, cout, residual=False):
            super().__init__()
            self.conv = torch_nn.Conv2d(cin, cout, 1, 1, 0, bias=False)
            self.bn = torch_nn.BatchNorm2d(cout)
            self.residual = residual

        def forward(self, *x):
            children = x
            out = self.bn(self.conv(torch.cat(x, 1)))
            if self.residual:
                out = out + children[0]
            return torch.relu(out)

    class TTree(torch_nn.Module):
        def __init__(self, levels, cin, cout, stride=1, level_root=False, root_dim=0):
            super().__init__()
            if root_dim == 0:
                root_dim = 2 * cout
            if level_root:
                root_dim += cin
            if levels == 1:
                self.tree1 = TBasicBlock(cin, cout, stride)
                self.tree2 = TBasicBlock(cout, cout, 1)
                self.root = TRoot(root_dim, cout)
            else:
                self.tree1 = TTree(levels - 1, cin, cout, stride, root_dim=0)
                self.tree2 = TTree(levels - 1, cout, cout, root_dim=root_dim + cout)
            self.level_root = level_root
            self.levels = levels
            self.downsample = torch_nn.MaxPool2d(stride, stride=stride) if stride > 1 else None
            self.project = (
                torch_nn.Sequential(
                    torch_nn.Conv2d(cin, cout, 1, bias=False), torch_nn.BatchNorm2d(cout)
                )
                if cin != cout
                else None
            )

        def forward(self, x, residual=None, children=None):
            children = [] if children is None else children
            bottom = self.downsample(x) if self.downsample else x
            residual = self.project(bottom) if self.project else bottom
            if self.level_root:
                children.append(bottom)
            x1 = self.tree1(x, residual)
            if self.levels == 1:
                x2 = self.tree2(x1)
                out = self.root(x2, x1, *children)
            else:
                children.append(x1)
                out = self.tree2(x1, children=children)
            return out

    class TDLA(torch_nn.Module):
        def __init__(self, levels=(1, 1, 1, 2, 2, 1), ch=(4, 8, 16, 16, 32, 32)):
            super().__init__()
            self.base_layer = torch_nn.Sequential(
                torch_nn.Conv2d(3, ch[0], 7, 1, 3, bias=False),
                torch_nn.BatchNorm2d(ch[0]),
                torch_nn.ReLU(True),
            )
            def conv_level(cin, cout, n, stride=1):
                mods = []
                for i in range(n):
                    mods += [
                        torch_nn.Conv2d(cin, cout, 3, stride if i == 0 else 1, 1, bias=False),
                        torch_nn.BatchNorm2d(cout),
                        torch_nn.ReLU(True),
                    ]
                    cin = cout
                return torch_nn.Sequential(*mods)
            self.level0 = conv_level(ch[0], ch[0], levels[0])
            self.level1 = conv_level(ch[0], ch[1], levels[1], 2)
            self.level2 = TTree(levels[2], ch[1], ch[2], 2, False)
            self.level3 = TTree(levels[3], ch[2], ch[3], 2, True)
            self.level4 = TTree(levels[4], ch[3], ch[4], 2, True)
            self.level5 = TTree(levels[5], ch[4], ch[5], 2, True)

        def forward(self, x):
            y = []
            x = self.base_layer(x)
            for i in range(6):
                x = getattr(self, f"level{i}")(x)
                y.append(x)
            return y

    ch = (4, 8, 16, 16, 32, 32)
    tmodel = TDLA(ch=ch).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    # flax side
    fmodel = DLA(levels=(1, 1, 1, 2, 2, 1), channels=ch)
    x = np.random.RandomState(0).randn(1, 32, 64, 3).astype(np.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    # wrap into the DLASeg-like tree path the importer expects
    wrapped = {
        "params": {"backbone": {"base": variables["params"]}},
        "batch_stats": {"backbone": {"base": variables["batch_stats"]}},
    }
    new_params, new_stats = import_torch_dla34(sd, wrapped)

    outs = fmodel.apply(
        {
            "params": new_params["backbone"]["base"],
            "batch_stats": new_stats["backbone"]["base"],
        },
        jnp.asarray(x),
        train=False,
    )
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for lvl in range(6):
        got = np.asarray(outs[lvl]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want[lvl].numpy(), rtol=1e-3, atol=1e-4)


def test_gen_data_roundtrip(tmp_path):
    from dcd_tpu.data.gen_data import (
        GenDataInferWriter,
        GenDataTrainWriter,
        load_gen_data_infer,
        load_gen_data_train,
    )

    rng = np.random.RandomState(0)
    w = GenDataTrainWriter()
    for _ in range(2):
        w.add_batch(
            rng.randn(3, 5, 2), rng.randn(3, 5, 3), rng.randn(3),
            rng.randn(3, 3), rng.randn(3, 3), ["000001", "000001", "000002"],
        )
    p = str(tmp_path / "gen_data_train.json")
    w.dump(p)
    data = load_gen_data_train(p, num_kpts=5)
    assert data["kpts_2d"].shape == (6, 5, 2)
    assert data["gt_location"].shape == (6, 3)

    wi = GenDataInferWriter()
    dets = rng.randn(4, 14)
    dets[:, 13] = 0.9
    valid = np.array([True, True, False, True])
    wi.add_image("000007", dets, valid, rng.randn(4, 5, 2), rng.randn(4, 5, 3))
    pi = str(tmp_path / "gen_data_infer.json")
    wi.dump(pi)
    arrays, img_idx = load_gen_data_infer(pi, num_kpts=5)
    assert arrays["kpts_2d"].shape == (3, 5, 2)
    assert img_idx[0] == ("000007", 0)
