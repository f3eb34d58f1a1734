"""Machine-check of the verification-rotation invariant.

The external driver value-certifies only the first ``WINDOW`` registry
queries per round; everything behind the window keeps an older round's
green row on the claim that its plan hasn't changed since. These tests
turn that claim into a failure mode: an out-of-window query whose
current plan fingerprint differs from the committed ledger fails the
suite — the fix is to move it into registry._VERIFY_FIRST (and regen
the ledger), never to quietly keep the stale certification.
"""

from __future__ import annotations

from flink_ecommerce_spark import registry

from tests.conftest import SF_SMALL
from tests.plan_fp import LEDGER_SF, load_ledger, plan_fingerprint

WINDOW = 50  # external driver verifies the first 50 queries() entries

# the shared registry_frames fixture constructs at SF_SMALL; the
# ledger is pinned at LEDGER_SF — they must stay the same path for
# the fixture's fingerprints to be the ledger's
assert LEDGER_SF == SF_SMALL


def test_ledger_covers_every_query():
    ledger = load_ledger()
    assert set(ledger) == set(registry.SPECS), (
        sorted(set(registry.SPECS) - set(ledger)),
        sorted(set(ledger) - set(registry.SPECS)),
    )


def test_window_is_the_verify_first_block():
    names = list(registry.SPECS)
    assert set(names[:WINDOW]) == set(registry._VERIFY_FIRST)
    assert len(registry._VERIFY_FIRST) == WINDOW


def test_window_plans_match_ledger(registry_frames):
    """In-window entries must track HEAD exactly: the round's external
    certification runs against HEAD, so a stale windowed fingerprint
    means someone changed a query after the last regen — regenerate
    (python -m tests.plan_fp) before committing.

    Uses the shared ``registry_frames`` construction (conftest.py):
    LEDGER_SF and the fixture's SF_SMALL are the same sf0.001 path, so
    the fingerprints are identical to constructing here."""
    frames, errors = registry_frames
    assert not errors, errors
    ledger = load_ledger()
    stale = []
    for name in list(registry.SPECS)[:WINDOW]:
        fp = plan_fingerprint(frames[name])
        if ledger.get(name) != fp:
            stale.append(name)
    assert not stale, (
        f"ledger is stale for in-window queries {stale}; regenerate with "
        "python -m tests.plan_fp"
    )


def test_out_of_window_plans_unchanged_since_certification(registry_frames):
    frames, errors = registry_frames
    assert not errors, errors
    ledger = load_ledger()
    out_of_window = list(registry.SPECS)[WINDOW:]
    drifted = []
    for name in out_of_window:
        fp = plan_fingerprint(frames[name])
        if ledger.get(name) != fp:
            drifted.append(name)
    assert not drifted, (
        f"plan changed since last certification for {drifted}; rotate them "
        "into registry._VERIFY_FIRST and regenerate the ledger "
        "(python -m tests.plan_fp)"
    )
