"""Property suite for schema evolution: random op sequences (rename /
add / drop / retype interleaved with merges and deletes) applied to a
clustered store must read back exactly like the same sequence applied
to an in-memory pandas model. Catches interaction bugs no example test
enumerates — name reuse after drop, rename chains, defaults landing on
pre-add files, mutations stamping the wrong schema version.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import rustac_ray.sources.clustered as cl

_BASE_COLS = ["c0", "c1", "c2"]


def _mk_base(n, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-120, -70, n)
    y = rng.uniform(25, 48, n)
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "c0": rng.integers(0, 50, n).astype(np.int64),
            "c1": rng.choice(["a", "b", "c"], n),
            "c2": rng.uniform(0, 1, n).round(6),
            "fp_xmin": x, "fp_ymin": y,
            "fp_xmax": x + 0.01, "fp_ymax": y + 0.01,
        }
    )


# op programs: small sequences over a bounded name pool so drops/adds
# collide with prior names (the resurrection footgun)
_NAMES = ["c0", "c1", "c2", "d0", "d1"]

_op = st.one_of(
    st.tuples(st.just("rename"), st.sampled_from(_NAMES), st.sampled_from(_NAMES)),
    st.tuples(st.just("drop"), st.sampled_from(_NAMES)),
    st.tuples(
        st.just("add"), st.sampled_from(_NAMES),
        st.one_of(
            st.integers(-5, 5),
            st.floats(-2.0, 2.0, allow_nan=False).map(lambda v: round(v, 3)),
        ),
    ),
    st.tuples(st.just("merge"), st.integers(0, 2**31 - 1)),
    st.tuples(st.just("delete"), st.integers(1, 8)),
)


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(prog=st.lists(_op, min_size=2, max_size=6), seed=st.integers(0, 10**6))
def test_random_evolution_program_matches_model(tmp_path_factory, prog, seed):
    base = _mk_base(120, seed)
    store = str(tmp_path_factory.mktemp("evoP") / "s")
    cl.write_clustered(
        rd.from_pandas(base), store, footprints_derived=True, rows_per_file=32
    )
    model = base.copy()  # rid + live user cols + fp_*
    next_merge_id = [len(base)]

    def live_user_cols():
        return [
            c for c in model.columns
            if c not in ("rid", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax")
        ]

    for op in prog:
        kind = op[0]
        if kind == "rename":
            _, old, new = op
            ok = (
                old in live_user_cols()
                and (new == old or new not in model.columns)
            )
            try:
                cl.evolve_clustered(store, rename={old: new})
                assert ok, f"rename {old}->{new} should have raised"
                model = model.rename(columns={old: new})
            except ValueError:
                assert not ok
        elif kind == "drop":
            _, name = op
            # legal iff live (rid stays tracked, so "drop everything"
            # can't trigger here)
            ok = name in live_user_cols()
            try:
                cl.evolve_clustered(store, drop=[name])
                assert ok, f"drop {name} should have raised"
                model = model.drop(columns=[name])
            except ValueError:
                assert not ok
        elif kind == "add":
            _, name, default = op
            ok = name not in live_user_cols()  # pool never collides rid/fp
            try:
                cl.evolve_clustered(store, add={name: default})
                assert ok, f"add {name} should have raised"
                model[name] = default
                if isinstance(default, int):
                    model[name] = model[name].astype(np.int64)
            except ValueError:
                assert not ok
        elif kind == "merge":
            _, s2 = op
            extra = _mk_base(20, s2).drop(columns=["c0", "c1", "c2"])
            extra["rid"] = np.arange(
                next_merge_id[0], next_merge_id[0] + 20, dtype=np.int64
            )
            next_merge_id[0] += 20
            for c in live_user_cols():
                col = model[c]
                if col.dtype == object:
                    extra[c] = "m"
                elif np.issubdtype(col.dtype, np.integer):
                    extra[c] = np.int64(7)
                else:
                    extra[c] = 0.5
            cl.merge_clustered(
                store, rd.from_pandas(extra[list(model.columns)]),
                footprints_derived=True,
            )
            model = pd.concat([model, extra[list(model.columns)]],
                              ignore_index=True)
        elif kind == "delete":
            _, k = op
            victims = model["rid"].iloc[::k].head(10).tolist()
            cl.delete_clustered(store, ids=victims, id_col="rid")
            model = model[~model["rid"].isin(victims)]

    got = cl.read_clustered(store).to_pandas()
    got = got.sort_values("rid").reset_index(drop=True)
    want = model.sort_values("rid").reset_index(drop=True)
    user = ["rid"] + live_user_cols()
    assert list(got["rid"]) == list(want["rid"])
    for c in user:
        g, w = got[c], want[c]
        if w.dtype == object:
            assert (g.fillna("§") == w.fillna("§")).all(), c
        else:
            np.testing.assert_allclose(
                g.to_numpy(np.float64), w.to_numpy(np.float64),
                rtol=0, atol=0, err_msg=c,
            )
    # schema introspection agrees with the model's live columns
    names = [c["name"] for c in cl.store_schema(store)]
    assert set(names) == set(user)
