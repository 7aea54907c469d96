"""Config system tests (LazyCall / instantiate / overrides / '???')."""

import pytest

from madm_tpu.config import (
    ConfigDict,
    LazyCall as L,
    LazyConfig,
    instantiate,
    set_by_path,
)


class Widget:
    def __init__(self, a, b=2, child=None):
        self.a, self.b, self.child = a, b, child


def test_lazycall_records_target():
    node = L(Widget)(a=1)
    assert node["_target_"] is Widget
    assert node.a == 1


def test_instantiate_recursive():
    cfg = L(Widget)(a=1, b=3, child=L(Widget)(a=10))
    w = instantiate(cfg)
    assert isinstance(w, Widget) and w.b == 3
    assert isinstance(w.child, Widget) and w.child.a == 10


def test_instantiate_list_of_nodes():
    out = instantiate([L(Widget)(a=1), L(Widget)(a=2)])
    assert [w.a for w in out] == [1, 2]


def test_missing_marker_raises():
    cfg = L(Widget)(a="???")
    with pytest.raises(ValueError, match="'\\?\\?\\?'"):
        instantiate(cfg)


def test_apply_overrides():
    cfg = ConfigDict(model=L(Widget)(a=1, b=2), lr=0.1)
    LazyConfig.apply_overrides(cfg, ["model.b=7", "lr=0.5", "tag=hello"])
    assert cfg.model.b == 7 and cfg.lr == 0.5 and cfg.tag == "hello"


def test_set_by_path_with_index():
    cfg = ConfigDict(xs=[ConfigDict(v=1), ConfigDict(v=2)])
    set_by_path(cfg, "xs[1].v", 9)
    assert cfg.xs[1].v == 9


def test_deepcopy_configdict():
    import copy

    cfg = ConfigDict(model=L(Widget)(a=[1, 2]))
    cfg2 = copy.deepcopy(cfg)
    cfg2.model.a.append(3)
    assert cfg.model.a == [1, 2]
