"""Execute the README quick-start code block (reference test_readme.py)."""

import re
import pathlib


def test_readme_quickstart_executes(tmp_path):
    readme = (pathlib.Path(__file__).parent.parent / "README.md").read_text()
    blocks = re.findall(r"```python\n(.*?)```", readme, re.DOTALL)
    assert blocks, "README must contain a python quick-start block"
    code = blocks[0]
    # smaller + synthetic so the quick-start runs in CI
    code = code.replace('num_items=10000', 'num_items=500')
    code = code.replace('d_output=192', 'd_output=32')
    code = code.replace('d_model=192, n_head=16, n_layer=3', 'd_model=32, n_head=2, n_layer=1')
    code = code.replace('"./out"', repr(str(tmp_path)))
    code = code.replace('data_loader_engine="parquet"', 'data_loader_engine="synthetic"')
    code = code.replace('per_device_train_batch_size=128', 'per_device_train_batch_size=8')
    code = code.replace(
        'train_dataset="train.parquet", eval_dataset="valid.parquet"',
        'train_dataset=None, eval_dataset=None',
    )
    ns: dict = {}
    exec(compile(code, "README-quickstart", "exec"), ns)
    assert "eval_/next-item/ndcg_at_10" in ns["metrics"]
    assert ns["ids"].shape[1] == 20
