"""End-to-end CLI smoke test: ``main.main(argv)`` trains 2 iters + evals.

Covers the layer no other test touches as a whole: argparse -> cfg
mutations (--debug/--bs/--max_iter/--eval_iter) -> LazyConfig overrides ->
builder -> sharded train loop with hooks (vis, periodic/best checkpoint,
eval) -> do_test -> evaluator, then ``--eval-only --init-from`` on the
saved best checkpoint (the reference's acceptance-test mode,
reference main.py:687-716).  The reference's analog is its --debug smoke
convention (reference main.py:356-360 — it ships no tests, SURVEY.md §4).
"""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_smoke")
    rng = np.random.default_rng(0)
    train = {"source_data": {"RGB": [], "label": []},
             "target_data": {"second_modality": []}}
    test = {"source_data": {"RGB": [], "label": []},
            "target_data": {"second_modality": [], "label": []}}
    for i in range(3):
        img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        lbl = rng.integers(0, 11, (64, 96), dtype=np.uint8)
        tgt = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / f"src{i}.png")
        Image.fromarray(lbl).save(root / f"lbl{i}.png")
        Image.fromarray(tgt).save(root / f"tgt{i}.png")
        train["source_data"]["RGB"].append(f"src{i}.png")
        train["source_data"]["label"].append(f"lbl{i}.png")
        train["target_data"]["second_modality"].append(f"tgt{i}.png")
        if i < 2:
            test["target_data"]["second_modality"].append(f"tgt{i}.png")
            test["target_data"]["label"].append(f"lbl{i}.png")
    (root / "train.json").write_text(json.dumps(train))
    (root / "test.json").write_text(json.dumps(test))
    return root


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli_smoke_run") / "run"


def base_argv(data_root, out):
    return [
        "--config-file",
        "config_files/SemSeg/MTMADISE/mtmadise_cityscapes_rgb_to_event_11.py",
        "--debug", "--bs", "1", "--max_iter", "2", "--eval_iter", "2",
        "--num_chips", "1", "--output", str(out),
        # trailing positional dot-overrides (d2 LazyConfig convention)
        f"dataloader.train.dataset.json_path={str(data_root / 'train.json')!r}",
        f"dataloader.train.dataset.source_root_path={str(data_root)!r}",
        f"dataloader.train.dataset.target_root_path={str(data_root)!r}",
        "dataloader.train.dataset.source_resize_h_w=[64,96]",
        "dataloader.train.dataset.source_crop_size_h_w=[64,64]",
        "dataloader.train.dataset.target_resize_h_w=[64,96]",
        "dataloader.train.dataset.target_crop_size_h_w=[64,64]",
        "dataloader.train.dataset.rare_class_sample=False",
        "dataloader.train.dataset.label_convert=None",
        "dataloader.train.num_workers=0",
        f"dataloader.test.dataset.json_path={str(data_root / 'test.json')!r}",
        f"dataloader.test.dataset.source_root_path={str(data_root)!r}",
        f"dataloader.test.dataset.target_root_path={str(data_root)!r}",
        "dataloader.test.dataset.test_resize_h_w=[64,64]",
        "dataloader.test.num_workers=0",
        # tiny model (the verify-skill shapes) without the s0/decoder branch
        "model.unet_channels=[32,64,128,128]",
        "model.vae_channels=[32,32,64,64]",
        "model.crop_size=[64,64]",
        "model.compute_dtype='float32'",
        "model.out_features=['s3','s4','s5']",
        "model.in_keys=['s3','s4','s5']",
        "model.feature_dims=[32,64,128]",
        "model.projection_dim=[32,32,32]",
        "model.vae_decoder_loss=None",
        "model.reg_uncertain=False",
        "model.remat=False",
        "train.log_period=1",
    ]


def test_main_debug_train_and_eval(data_root, run_dir):
    from main import main

    state = main(base_argv(data_root, run_dir))
    assert int(state.step) == 2

    # setup() dumped the resolved config; --debug renamed nothing here but
    # shrank the hook periods, so iter-2 triggered eval + checkpoint + vis
    assert (run_dir / "config.yaml").exists()
    files = {p.name for p in run_dir.rglob("*")}
    assert "metrics.json" in files, sorted(files)
    # iter-2 eval found a first best -> BestCheckpointer saved model_best
    assert any(f.startswith("model_best") for f in files), sorted(files)
    # eval results are flattened into EventStorage and force-written, so
    # mIoU lands in metrics.json like every other scalar (reference
    # EvalHook, engine/hooks.py:16-52)
    rows = [json.loads(line)
            for line in (next(p for p in run_dir.rglob("metrics.json"))
                         ).read_text().splitlines()]
    assert any("eval/mIoU" in r for r in rows), rows


def test_main_eval_only_init_from_best(data_root, run_dir, tmp_path):
    """--eval-only --init-from <model_best> — reference main.py:687-716.

    Runs after the train smoke (same module) so the saved best checkpoint
    and the process-local jit caches are reused.
    """
    from main import main

    best = sorted(run_dir.rglob("model_best*"))
    assert best, "train smoke must have saved a best checkpoint"
    out = tmp_path / "eval_run"
    argv = base_argv(data_root, out)
    # flags must precede the REMAINDER dot-overrides or argparse eats them
    ins = argv.index("--output") + 2
    argv[ins:ins] = ["--eval-only", "--init-from", str(best[0])]
    results = main(argv)
    assert "mIoU" in results, results
    assert np.isfinite(float(results["mIoU"]))
