"""Registry contract guards (queries.py ordering/count contract).

The external correctness driver records only the FIRST 50 registry
entries (rounds 1-4: CORRECTNESS file size == min(registry size, 50);
round 4 silently lost its four tail keys at 54). These guards fail the
build the moment a change would re-open that hole."""

import moonlink_ray.queries as q


def test_registry_holds_exactly_fifty_keys():
    assert len(q.queries()) == 50


def test_oracle_bearing_keys_precede_rows_only():
    keys = list(q.queries())
    oracles = set(q.oracle_sql())
    flags = [k in oracles for k in keys]
    # once the first rows-only key appears, no oracle-bearing key may
    # follow it (it would risk truncation while a weaker check stays)
    first_rows_only = flags.index(False)
    late_oracles = [k for k, f in list(zip(keys, flags))[first_rows_only:]
                    if f]
    assert not late_oracles, (
        f"oracle-bearing keys ordered after a rows-only key: {late_oracles}")


def test_every_oracle_has_a_query():
    missing = set(q.oracle_sql()) - set(q.queries())
    assert not missing, f"orphan oracle_sql entries: {sorted(missing)}"


def test_rows_only_tail_is_the_documented_set():
    keys = list(q.queries())
    oracles = set(q.oracle_sql())
    rows_only = [k for k in keys if k not in oracles]
    assert rows_only == ["audio_features", "text_rolling_fp",
                        "dedup_approx", "ann_approx"]
