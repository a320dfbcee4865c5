"""Filter registry: named boolean Column expressions over alert DataFrames.

Parity surface (reference behaviors being replaced):
- ``apply_user_defined_filter(df, "pkg.mod.fn")`` — fink-utils, used across
  ~30 doctests (e.g. ``ztf/filter_example/filter.py:87-92``): resolve dotted
  name, bind UDF arg names to (nested) columns, filter.
- ``FinkUDF``/``apply_block`` (``rubin/utils.py:115-134``): wrap a plain
  function, infer columns from its signature.
- per-filter ``DESCRIPTION`` / ``HBASE_SUPPORT`` module constants
  (``rubin/livestream/filter_in_tns/filter.py:19-20``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class FilterInfo:
    name: str
    builder: Callable[[DataFrame], Column]
    description: str = ""
    survey: str = ""
    reference: str = ""  # file:line in the reference repo
    hbase_support: bool = False
    requires: tuple[str, ...] = field(default_factory=tuple)  # column names


_REGISTRY: dict[str, FilterInfo] = {}


def register(
    name: str,
    description: str = "",
    reference: str = "",
    hbase_support: bool = False,
    requires: tuple[str, ...] = (),
):
    """Decorator: register ``fn(df) -> Column`` as topic ``name``."""

    def deco(fn: Callable[[DataFrame], Column]):
        desc = description
        if not desc and fn.__doc__:
            desc = fn.__doc__.strip().splitlines()[0]
        _REGISTRY[name] = FilterInfo(
            name=name,
            builder=fn,
            description=desc,
            survey=name.split(".", 1)[0],
            reference=reference,
            hbase_support=hbase_support,
            requires=requires,
        )
        return fn

    return deco


def get_filter(name: str) -> FilterInfo:
    if name not in _REGISTRY:
        info = _resolve_dotted(name)
        if info is not None:
            return info
        raise KeyError(
            f"unknown filter {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def _resolve_dotted(name: str) -> FilterInfo | None:
    """A1/A2 dynamic parity: resolve 'pkg.mod.fn' to a user-supplied builder
    (a plain ``df -> Column`` function), exactly the reference's
    ``apply_user_defined_filter(df, "fink_filters....filter.foo")`` contract
    for filters not shipped in this registry."""
    import importlib

    if "." not in name:
        return None
    mod_path, _, fn_name = name.rpartition(".")
    try:
        mod = importlib.import_module(mod_path)
    except ImportError:
        return None
    fn = getattr(mod, fn_name, None)
    if fn is None:
        return None
    return FilterInfo(name=name, builder=fn, description=f"dynamic: {name}")


def apply_named_filter(df: DataFrame, name: str) -> DataFrame:
    """A1 parity: ``apply_named_filter(df, 'ztf.sn_candidates')``."""
    return df.filter(get_filter(name).builder(df))


def filter_catalog() -> list[FilterInfo]:
    """Operator-catalog metadata (A8 parity)."""
    return sorted(_REGISTRY.values(), key=lambda i: i.name)
