"""Property tests for the fixed-shape packing/migration primitives — the
machinery every dynamic-lifecycle feature rests on (SURVEY.md §7 hard
parts 2 and 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pypic_tpu.utils import compact_rows, pack_rows, place_rows


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("cap", [1, 7, 64, 300])
def test_pack_rows_accounting(seed, cap):
    rng = np.random.default_rng(seed)
    n = 257
    mask = jnp.asarray(rng.uniform(size=n) < 0.3)
    vals = jnp.asarray(rng.normal(size=n).astype(np.float32))
    (buf,), n_valid, overflow = pack_rows(mask, [vals], cap)
    total = int(np.asarray(mask).sum())
    assert int(n_valid) == min(total, cap)
    assert int(overflow) == max(0, total - cap)
    # packed rows are exactly the first n_valid selected rows, in order
    expect = np.asarray(vals)[np.asarray(mask)][:int(n_valid)]
    np.testing.assert_array_equal(np.asarray(buf)[:int(n_valid)], expect)
    # slots beyond n_valid stay zero
    assert (np.asarray(buf)[int(n_valid):] == 0).all()


@pytest.mark.parametrize("seed", [3, 4])
def test_place_rows_conserves_rows(seed):
    rng = np.random.default_rng(seed)
    n, k = 101, 17
    free = jnp.asarray(rng.uniform(size=n) < 0.4)
    old = jnp.asarray(rng.normal(size=n).astype(np.float32))
    new = jnp.asarray(rng.normal(size=k).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=k) < 0.7)
    count = jnp.asarray(int(np.asarray(valid).sum()), jnp.int32)
    (updated,), take, placed = place_rows(free, [new], count, [old],
                                          valid=valid)
    n_free = int(np.asarray(free).sum())
    assert int(placed) == min(int(count), n_free)
    # non-taken slots untouched
    t = np.asarray(take)
    np.testing.assert_array_equal(np.asarray(updated)[~t], np.asarray(old)[~t])
    # taken slots received the valid new rows, in order
    np.testing.assert_array_equal(
        np.asarray(updated)[t], np.asarray(new)[np.asarray(valid)][:int(placed)]
    )


@pytest.mark.parametrize("seed", list(range(5)))
def test_migrate_mass_conservation_fuzz(seed):
    """Random positions/occupancy: migration conserves every particle that
    has a destination slot (alive_in == alive_out + dropped), never
    duplicates a tag, and every survivor lands on its owner shard."""
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from pypic_tpu.parallel import domain, make_mesh

    d_tot, ng = 8, 64
    c = ng // d_tot
    cap_slots = 32
    rng = np.random.default_rng(seed)
    mesh = make_mesh(d_tot, axis="slabs")

    alive = rng.uniform(size=(d_tot, cap_slots)) < 0.5
    p = rng.uniform(0, ng, (d_tot, cap_slots)).astype(np.float32)
    tags = np.arange(d_tot * cap_slots, dtype=np.float32).reshape(
        d_tot, cap_slots
    )

    def f(p, tags, alive):
        d = lax.axis_index("slabs")
        (p2, t2), alive2, n_mig, n_drop = domain.migrate(
            [p, tags], alive, d,
            ng=ng, cells_per_shard=c, num_shards=d_tot, cap=16, ax="slabs",
        )
        owner_ok = jnp.where(
            alive2,
            (jnp.clip(jnp.floor(p2).astype(jnp.int32), 0, ng - 1) // c) == d,
            True,
        )
        return p2, t2, alive2, jnp.all(owner_ok), n_mig, n_drop

    shard = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("slabs"),) * 3,
        out_specs=(P("slabs"), P("slabs"), P("slabs"), P(), P(), P()),
        check_vma=False,
    )
    p2, t2, alive2, owner_ok, n_mig, n_drop = shard(
        jnp.asarray(p.reshape(-1)), jnp.asarray(tags.reshape(-1)),
        jnp.asarray(alive.reshape(-1)),
    )
    n_in = int(alive.sum())
    n_out = int(np.asarray(alive2).sum())
    assert n_out + int(n_drop) == n_in
    assert bool(owner_ok)
    surviving = np.asarray(t2)[np.asarray(alive2)]
    assert len(np.unique(surviving)) == len(surviving)  # no duplication
    # survivors are a subset of the input population
    assert set(surviving.tolist()) <= set(tags[alive].tolist())
