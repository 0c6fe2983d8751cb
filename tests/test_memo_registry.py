"""Locks the session-memo clearing convention (round-18 verdict item 8).

Every cross-query session memo must be a module-level ``_*_MEMO`` dict
in one of ``memos.MEMO_MODULES`` so that scale instruments price full
builds: a memo added in an unlisted module, or under a non-conforming
name, would silently survive clear_session_memos() — the r18 verdict
flagged exactly that as the line between legitimate within-session
sharing and gaming. No Spark session needed.
"""

from __future__ import annotations

import importlib
import pkgutil
import re

import aws_lambda_redshift_loader_spark as pkg
from aws_lambda_redshift_loader_spark.memos import (
    MEMO_MODULES,
    clear_session_memos,
    iter_session_memos,
)

_MEMO_NAME = re.compile(r"_[A-Z0-9_]*_MEMO")


def _all_package_modules():
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        yield importlib.import_module(info.name)


def test_every_memo_dict_is_registered():
    registered = {(m, n) for m, n, _ in iter_session_memos()}
    found = set()
    for mod in _all_package_modules():
        for name in dir(mod):
            if _MEMO_NAME.fullmatch(name) and isinstance(
                getattr(mod, name), dict
            ):
                # Attribute re-exports resolve to the defining module via
                # the object identity check below; here record the sight.
                found.add((mod.__name__, name))
    unregistered = {
        (m, n)
        for (m, n) in found
        if m in MEMO_MODULES and (m, n) not in registered
    }
    assert not unregistered, f"memo dicts escaping clear: {unregistered}"
    # Any memo-named dict OUTSIDE the registered modules must be the
    # same object as a registered one (a re-export), else the registry
    # misses it.
    registered_objs = {id(d) for _, _, d in iter_session_memos()}
    strays = {
        (m, n)
        for (m, n) in found
        if m not in MEMO_MODULES
        and id(getattr(importlib.import_module(m), n)) not in registered_objs
    }
    assert not strays, f"memo dicts in unregistered modules: {strays}"


def test_clear_session_memos_clears_everything():
    # Seed every registered memo with a sentinel, clear, assert empty.
    memos = [d for _, _, d in iter_session_memos()]
    assert len(memos) >= 25  # the r18 audit counted ~30; guard the sweep
    for d in memos:
        d["__sentinel__"] = object()
    n = clear_session_memos()
    assert n == len(memos)
    assert all(not d for d in memos)


def test_docstream_memo_registered():
    # The r19 fused doc stream's memo must be in the sweep (the newest
    # memo is always the one a hand list would have missed).
    names = {n for _, n, _ in iter_session_memos()}
    assert "_DOCSTREAM_MEMO" in names
