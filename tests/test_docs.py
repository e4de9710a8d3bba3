"""Docs can't drift: docs/reference.md is generated from live docstrings
(`tools/gen_api_docs.py`, the autodoc analog of the reference's Sphinx site,
`/root/reference/docs/source/rankfm.rst:4`), and the hand-written
docs/api.md must keep covering the live constructor/method surface."""

import importlib.util
import inspect
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", os.path.join(REPO, "tools", "gen_api_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generated_reference_is_current():
    gen = _load_gen()
    with open(os.path.join(REPO, "docs", "reference.md")) as fh:
        on_disk = fh.read()
    assert on_disk == gen.generate(), (
        "docs/reference.md is stale — run `python tools/gen_api_docs.py`")


def test_api_md_covers_live_constructor_and_methods():
    from rankfm_tpu import RankFM

    with open(os.path.join(REPO, "docs", "api.md")) as fh:
        api = fh.read()
    params = inspect.signature(RankFM.__init__).parameters
    for p in params:
        if p == "self":
            continue
        assert f"`{p}`" in api, f"ctor param [{p}] missing from docs/api.md"
    for m in ("fit", "fit_partial", "predict", "recommend",
              "similar_items", "similar_users", "save", "load"):
        assert f"`{m}(" in api or f"`RankFM.{m}(" in api, \
            f"method [{m}] missing from docs/api.md"
