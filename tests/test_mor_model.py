"""Model-based law test for the merge-on-read write surface: a seeded
random sequence of upserts, vectorized/classic DELETEs and UPDATEs,
CDC batches, purges and compactions must leave the table EXACTLY equal
to a plain dict model after every step — whatever mix of masks,
carries, fallbacks and materializations the engine chose underneath
(the tiny mask budget forces fallback-to-rewrite mid-sequence).
Catches cross-feature interactions (mask-on-mask, budget fallbacks,
purge-then-upsert) that single-feature tests can't."""
import random

from patterns_devkit_spark import Table


def _assert_state(t, model, step):
    got = {r["id"]: r["v"] for r in t.read_spark().collect()}
    assert got == model, f"step {step}: engine={got} model={model}"


def test_mor_random_sequences(engine):
    for seed in (1, 7, 23):
        name = f"morm{seed}"
        rng = random.Random(seed)
        model = {i: i for i in range(20)}
        with engine.node_context("n", outputs={"out": name}):
            t = Table("out", "w")
            # tiny budget so fallback-to-rewrite happens mid-sequence
            t.init(unique_on=["id"], merge_on_read=8, stat_columns=["id"])
            t.append([{"id": i, "v": i} for i in range(20)])
            t.flush()
            for step in range(12):
                op = rng.choice(
                    ["upsert", "dv_del", "del", "dv_upd", "upd", "cdc", "purge", "compact"]
                )
                if op == "upsert":
                    ks = rng.sample(range(40), rng.randint(1, 4))
                    vals = {k: rng.randint(-99, 99) for k in ks}
                    t.upsert([{"id": k, "v": v} for k, v in vals.items()])
                    t.flush()
                    model.update(vals)
                elif op in ("dv_del", "del"):
                    m = rng.randint(2, 9)
                    r = rng.randint(0, m - 1)
                    t.delete_where(f"id % {m} = {r}", vectorized=(op == "dv_del"))
                    model = {k: v for k, v in model.items() if k % m != r}
                elif op in ("dv_upd", "upd"):
                    m = rng.randint(2, 9)
                    r = rng.randint(0, m - 1)
                    d = rng.randint(1, 50)
                    t.update_where(
                        {"v": f"v + {d}"}, f"id % {m} = {r}", vectorized=(op == "dv_upd")
                    )
                    model = {k: (v + d if k % m == r else v) for k, v in model.items()}
                elif op == "cdc":
                    ks = rng.sample(range(40), 3)
                    batch = [
                        {
                            "op": "U" if ks[0] in model else "I",
                            "id": ks[0],
                            "v": rng.randint(-99, 99),
                        },
                        {"op": "D", "id": ks[1], "v": None},
                        {
                            "op": "U" if ks[2] in model else "I",
                            "id": ks[2],
                            "v": rng.randint(-99, 99),
                        },
                    ]
                    t.apply_cdc(batch)
                    for b in batch:
                        if b["op"] == "D":
                            model.pop(b["id"], None)
                        else:
                            model[b["id"]] = b["v"]
                elif op == "purge":
                    t.purge_deletes()
                elif op == "compact":
                    t.compact(target_files=2)
                _assert_state(t, model, f"{seed}/{step}:{op}")
