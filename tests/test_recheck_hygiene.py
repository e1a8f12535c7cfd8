"""Mechanical _RECHECK hygiene (SCALE.md "Correctness-attestation
hygiene"): driver CORRECTNESS rows attest the code AS OF the round they
were taken, so any behavior change to a registered query must add a
registry._RECHECK entry or the stale green row keeps vouching for code
that no longer exists.

This test makes the rule impossible to forget: every engine module is
fingerprinted into tests/module_fingerprints.json, and a commit that
changes a module without regenerating the lockfile fails here. The
regeneration step (`python tests/test_recheck_hygiene.py`) is the
moment to decide: did this change any registered query's RESULTS? If
yes, add `{query_name: <next round>}` to registry._RECHECK in the same
commit; if no (comment/doc/perf-neutral refactor), regenerating the
lockfile IS the no-behavior-change attestation.
"""

from __future__ import annotations

import hashlib
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "recipes_spark")
LOCKFILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "module_fingerprints.json")


def current_fingerprints() -> dict[str, str]:
    out: dict[str, str] = {}
    for dirpath, dirnames, filenames in os.walk(PKG):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, REPO)
            with open(path, "rb") as fh:
                out[rel] = hashlib.sha256(fh.read()).hexdigest()[:16]
    entry = os.path.join(REPO, "__spark_entry__.py")
    with open(entry, "rb") as fh:
        out["__spark_entry__.py"] = hashlib.sha256(fh.read()).hexdigest()[:16]
    return out


def test_recheck_names_are_registered():
    """A typo'd _RECHECK key silently re-checks nothing."""
    from recipes_spark.registry import _RECHECK, all_queries

    unknown = set(_RECHECK) - set(all_queries())
    assert not unknown, f"_RECHECK entries for unregistered queries: {unknown}"


def test_module_fingerprints_current():
    with open(LOCKFILE) as fh:
        locked = json.load(fh)
    cur = current_fingerprints()
    changed = sorted(
        set(k for k in cur if locked.get(k) != cur[k])
        | (set(locked) - set(cur))
    )
    assert not changed, (
        "engine modules changed without updating the attestation lockfile:\n  "
        + "\n  ".join(changed)
        + "\nIf the change alters any registered query's results, add "
        "registry._RECHECK entries for the affected queries NOW, then run "
        "`python tests/test_recheck_hygiene.py` to regenerate the lockfile "
        "in the same commit. If results are unchanged, regenerating is the "
        "no-behavior-change attestation."
    )


if __name__ == "__main__":
    with open(LOCKFILE, "w") as fh:
        json.dump(current_fingerprints(), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {LOCKFILE}")


def test_front_and_defer_names_are_registered_and_ordered():
    """_FRONT/_DEFER govern the driver's bounded per-round sample: a
    typo'd name silently reprioritizes nothing, and the invariants —
    tier-1 _RECHECK first, _FRONT leading the unattested tier, _DEFER
    trailing it, attested names last — must hold over the real
    registry + CORRECTNESS history."""
    from recipes_spark.registry import (
        _DEFER,
        _FRONT,
        _RECHECK,
        _driver_attested,
        all_queries,
    )

    order = list(all_queries())
    names = set(order)
    assert not (set(_FRONT) - names), "unregistered _FRONT names"
    assert not (set(_DEFER) - names), "unregistered _DEFER names"

    attested = _driver_attested()
    tiers = []
    for n in order:
        if n in attested:
            tiers.append(4)
        elif n in _RECHECK:
            tiers.append(0)
        elif n in _FRONT:
            tiers.append(1)
        elif n in _DEFER:
            tiers.append(3)
        else:
            tiers.append(2)
    assert tiers == sorted(tiers), (
        "registry ordering violates tier invariants: "
        + str([(n, t) for n, t in zip(order, tiers)][:40])
    )
    # Within the defer tier, older rounds' registrations must come
    # first — a new round's names can never displace prior backlog.
    defer_rounds = [_DEFER[n] for n, t in zip(order, tiers) if t == 3]
    assert defer_rounds == sorted(defer_rounds), defer_rounds
