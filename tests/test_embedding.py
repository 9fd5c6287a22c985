"""First-party embedding pipeline tests (VERDICT r4 #1).

The fake hardware sampler here is STRUCTURED: it rejects any problem not
already mapped onto its hardware graph — un-embedded couplers or unknown
qubits raise.  That makes it the analogue of real annealer hardware the
duck-typed fakes in test_qpu_adapter.py (which accept anything) are not:
the StructuredQPUSampler tests below only pass if the adapter genuinely
embeds, and the call-count tests pin the reference's compute-once-per-
structure reuse contract (``src/model/faster_dqbm.py:152-165``).
"""

from __future__ import annotations

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbmx.embedding import (
    EmbeddingCache,
    adjacency_from_edgelist,
    chain_strength_for,
    chimera_graph,
    chimera_index,
    clique_embedding_chimera,
    embed_qubo,
    escalating_find_embedding,
    find_embedding,
    partition_target,
    subgraph,
    target_fingerprint,
    unembed_samples,
    verify_embedding,
)
from qbmx.samplers.qpu import QPUSampler, StructuredQPUSampler, _qubo_dict


def logical_energy(Q, x):
    return float(x @ np.triu(Q, 1) @ x + np.diag(Q) @ x)


def dict_energy(qdict, assign):
    e = 0.0
    for (i, j), v in qdict.items():
        e += v * assign[i] * (assign[j] if j != i else 1.0)
    return e


class FakeSampleSet:
    def __init__(self, samples, variables, qpu_us=11.0):
        self.record = types.SimpleNamespace(sample=np.asarray(samples))
        self.variables = list(variables)
        self.info = {"timing": {"qpu_access_time": qpu_us}}


class FakeHardwareSampler:
    """Structured 'annealer': REJECTS problems not mapped onto its graph,
    then samples by host-side Metropolis annealing over the physical QUBO."""

    def __init__(self, adjacency, topology=None, seed=0, sweeps=150):
        self.adjacency = adjacency
        self.nodelist = sorted(adjacency)
        self.edgelist = sorted(
            (min(u, v), max(u, v)) for u in adjacency for v in adjacency[u])
        self._edgeset = set(self.edgelist)
        self.properties = {"topology": topology} if topology else {}
        self.rng = np.random.default_rng(seed)
        self.sweeps = sweeps
        self.calls = 0

    def sample_qubo(self, qdict, num_reads=1, **_):
        self.calls += 1
        for i, j in qdict:
            if i == j:
                if i not in self.adjacency:
                    raise ValueError(f"qubit {i} is not on this chip")
            elif (min(i, j), max(i, j)) not in self._edgeset:
                raise ValueError(f"coupler ({i},{j}) is not on the hardware graph")
        variables = sorted({q for ij in qdict for q in ij})
        idx = {q: c for c, q in enumerate(variables)}
        nv = len(variables)
        Q = np.zeros((nv, nv))
        for (i, j), v in qdict.items():
            Q[idx[min(i, j)], idx[max(i, j)]] += v
        h = np.diag(Q).copy()
        J = np.triu(Q, 1)
        Jsym = J + J.T
        x = (self.rng.random((num_reads, nv)) < 0.5).astype(float)
        for beta in np.geomspace(0.1, 6.0, self.sweeps):
            for q in self.rng.permutation(nv):
                dE = (1.0 - 2.0 * x[:, q]) * (x @ Jsym[:, q] + h[q])
                p = np.exp(-beta * np.clip(dE, 0.0, 50.0))
                flip = self.rng.random(num_reads) < p
                x[:, q] = np.where(flip, 1.0 - x[:, q], x[:, q])
        return FakeSampleSet(x, variables)


CHIMERA_TOPO = {"type": "chimera", "shape": [2, 2, 4]}


# ---------------------------------------------------------------------------
# hardware graph + clique construction


class TestChimeraGraph:
    def test_counts(self):
        m, t = 2, 4
        adj = chimera_graph(m, t=t)
        assert len(adj) == 2 * t * m * m
        n_edges = sum(len(v) for v in adj.values()) // 2
        internal = t * t * m * m
        external = 2 * t * (m - 1) * m
        assert n_edges == internal + external

    def test_shore_coupling_directions(self):
        adj = chimera_graph(3, t=4)
        v0 = chimera_index(0, 1, 0, 2, 3, 3, 4)  # shore 0 couples vertically
        v1 = chimera_index(1, 1, 0, 2, 3, 3, 4)
        assert v1 in adj[v0]
        h0 = chimera_index(1, 0, 1, 3, 3, 3, 4)  # shore 1 couples horizontally
        h1 = chimera_index(1, 1, 1, 3, 3, 3, 4)
        assert h1 in adj[h0]


class TestCliqueEmbedding:
    @pytest.mark.parametrize("n", [2, 3, 5, 8])
    def test_valid_in_c2(self, n):
        adj = chimera_graph(2)
        emb = clique_embedding_chimera(n, 2)
        edges = [(u, v) for u in range(n) for v in range(u + 1, n)]
        assert emb is not None and verify_embedding(emb, edges, adj) == []

    def test_too_big_returns_none(self):
        assert clique_embedding_chimera(9, 2) is None  # A=3 > m=2

    def test_offset_blocks_are_disjoint_and_valid(self):
        adj = chimera_graph(4)
        edges = [(u, v) for u in range(4) for v in range(u + 1, 4)]
        embs = [clique_embedding_chimera(4, 4, cell_offset=(r, c))
                for r in range(4) for c in range(4)]
        used = set()
        for emb in embs:
            assert verify_embedding(emb, edges, adj) == []
            qubits = {q for ch in emb.values() for q in ch}
            assert not (qubits & used)
            used |= qubits


# ---------------------------------------------------------------------------
# heuristic search


class TestFindEmbedding:
    def test_cycle_into_single_cell(self):
        adj = chimera_graph(1)  # one K_{4,4} cell
        edges = [(i, (i + 1) % 8) for i in range(8)]
        emb = find_embedding(edges, adj, seed=0, tries=8, rounds=24)
        assert emb is not None and verify_embedding(emb, edges, adj) == []

    def test_k4_into_single_cell_needs_chains(self):
        adj = chimera_graph(1)
        edges = [(u, v) for u in range(4) for v in range(u + 1, 4)]
        emb = escalating_find_embedding(edges, adj, seed=0)
        assert emb is not None and verify_embedding(emb, edges, adj) == []
        assert max(len(c) for c in emb.values()) >= 2  # K4 ⊄ K_{4,4}

    def test_k5_into_c2(self):
        adj = chimera_graph(2)
        edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
        emb = escalating_find_embedding(edges, adj, seed=1)
        assert emb is not None and verify_embedding(emb, edges, adj) == []

    def test_impossible_target_returns_none(self):
        adj = adjacency_from_edgelist([(0, 1), (1, 2)])  # a path of 3 qubits
        edges = [(u, v) for u in range(4) for v in range(u + 1, 4)]
        assert escalating_find_embedding(edges, adj, seed=0,
                                         ladder=((2, 4),)) is None

    def test_verify_catches_defects(self):
        adj = chimera_graph(1)
        # disconnected chain: two qubits on the same shore never couple
        bad = {0: (chimera_index(0, 0, 0, 0, 1, 1, 4),
                   chimera_index(0, 0, 0, 1, 1, 1, 4))}
        assert any("disconnected" in p for p in verify_embedding(bad, [], adj))
        # reuse across chains
        q = chimera_index(0, 0, 0, 0, 1, 1, 4)
        assert any("reused" in p
                   for p in verify_embedding({0: (q,), 1: (q,)}, [], adj))
        # missing physical coupler for a source edge
        a = chimera_index(0, 0, 0, 0, 1, 1, 4)
        b = chimera_index(0, 0, 0, 1, 1, 1, 4)
        assert any("no physical coupler" in p
                   for p in verify_embedding({0: (a,), 1: (b,)}, [(0, 1)], adj))


class TestPartition:
    def test_regions_disjoint_and_cover(self):
        adj = chimera_graph(4)
        regions = partition_target(adj, 4, seed=0)
        assert len(regions) == 4
        all_nodes = set().union(*regions)
        assert sum(len(r) for r in regions) == len(all_nodes)  # disjoint
        sizes = sorted(len(r) for r in regions)
        assert sizes[0] >= len(adj) // 8  # roughly balanced

    def test_buffer_removes_cross_couplers(self):
        adj = chimera_graph(3)
        regions = partition_target(adj, 2, seed=0, buffer=True)
        r0, r1 = regions
        assert not any(p in r1 for q in r0 for p in adj[q])

    def test_subgraph_restricts(self):
        adj = chimera_graph(2)
        region = partition_target(adj, 2, seed=0)[0]
        sub = subgraph(adj, region)
        assert set(sub) == region
        assert all(nbrs <= region for nbrs in sub.values())


# ---------------------------------------------------------------------------
# chain encode / decode


class TestEmbedQubo:
    def test_energy_equivalence_for_aligned_states(self):
        """Aligned physical states reproduce the logical energy exactly:
        linear splits sum back, coupling splits sum back, chain penalty 0."""
        adj = chimera_graph(1)
        n = 3
        emb = clique_embedding_chimera(n, 1)
        rng = np.random.default_rng(0)
        Q = np.triu(rng.uniform(-1, 1, (n, n))).astype(np.float32)
        qdict = _qubo_dict(Q)
        phys = embed_qubo(qdict, emb, adj, chain_strength=2.0)
        edgeset = {(min(u, v), max(u, v)) for u in adj for v in adj[u]}
        for i, j in phys:
            assert i == j or (i, j) in edgeset
        for bits in range(2**n):
            x = np.array([(bits >> b) & 1 for b in range(n)], dtype=float)
            assign = {q: x[v] for v, ch in emb.items() for q in ch}
            np.testing.assert_allclose(dict_energy(phys, assign),
                                       logical_energy(Q, x), atol=1e-5)

    def test_broken_chain_pays_penalty(self):
        adj = chimera_graph(1)
        emb = clique_embedding_chimera(2, 1)
        qdict = {(0, 0): 0.0, (1, 1): 0.0, (0, 1): 0.3}
        phys = embed_qubo(qdict, emb, adj, chain_strength=2.0)
        aligned = {q: 1.0 for ch in emb.values() for q in ch}
        broken = dict(aligned)
        broken[emb[0][0]] = 0.0  # break one chain edge
        assert dict_energy(phys, broken) > dict_energy(phys, aligned) + 1.0

    def test_rejects_uncovered_coupling(self):
        adj = chimera_graph(1)
        # two chains with no coupler between them: same-shore singletons
        emb = {0: (chimera_index(0, 0, 0, 0, 1, 1, 4),),
               1: (chimera_index(0, 0, 0, 1, 1, 1, 4),)}
        with pytest.raises(ValueError, match="no physical coupler"):
            embed_qubo({(0, 1): 1.0}, emb, adj)

    def test_chain_strength_scales_with_couplings(self):
        weak = chain_strength_for({(0, 1): 0.1, (0, 0): 1.0})
        strong = chain_strength_for({(0, 1): 40.0, (0, 0): 1.0})
        assert strong > weak >= 1.0
        assert chain_strength_for({(0, 0): -3.0}) == 1.0  # linear-only floor


class TestUnembed:
    def test_majority_vote_and_break_fraction(self):
        emb = {0: (10, 11, 12), 1: (20,)}
        cols = {10: 0, 11: 1, 12: 2, 20: 3}
        phys = np.array([[1, 1, 0, 1],   # var0 majority 1 (broken), var1=1
                         [0, 0, 0, 0],   # intact
                         [1, 0, 0, 1]])  # var0 majority 0 (broken)
        out, frac = unembed_samples(phys, cols, emb)
        np.testing.assert_array_equal(out, [[1, 1], [0, 0], [0, 1]])
        assert frac == pytest.approx(2 / 6)

    def test_tie_rounds_up(self):
        emb = {0: (1, 2)}
        out, frac = unembed_samples(np.array([[1, 0]]), {1: 0, 2: 1}, emb)
        assert out[0, 0] == 1.0 and frac == 1.0


def test_embedding_cache_disk_roundtrip(tmp_path):
    c1 = EmbeddingCache(tmp_path)
    c1.put("clique_3_x1_ab", [{0: (1, 2)}])
    c2 = EmbeddingCache(tmp_path)  # fresh instance, warm disk
    assert c2.get("clique_3_x1_ab") == [{0: (1, 2)}]
    assert c2.get("missing") is None
    assert (tmp_path / "embeddings_clique_3_x1_ab.pkl").exists()


def test_target_fingerprint_distinguishes_chips():
    assert target_fingerprint(chimera_graph(1)) != target_fingerprint(chimera_graph(2))
    assert target_fingerprint(chimera_graph(2)) == target_fingerprint(chimera_graph(2))


# ---------------------------------------------------------------------------
# the structured adapter end-to-end


class TestStructuredQPUSampler:
    def test_fake_hardware_rejects_unembedded_problems(self):
        fake = FakeHardwareSampler(chimera_graph(2), topology=CHIMERA_TOPO)
        with pytest.raises(ValueError, match="coupler"):
            fake.sample_qubo({(0, 9): 1.0}, num_reads=1)  # same-shore pair
        with pytest.raises(ValueError, match="qubit"):
            fake.sample_qubo({(999, 999): 1.0}, num_reads=1)

    def test_ground_state_recovery_through_embedding(self):
        fake = FakeHardwareSampler(chimera_graph(2), topology=CHIMERA_TOPO,
                                   seed=0, sweeps=200)
        adapter = StructuredQPUSampler(fake)
        Q = jnp.asarray(np.array([[-2.0, 3.0], [0.0, -1.0]], np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 64))[0]
        assert out.shape == (64, 2)
        # ground state [1, 0] (E=-2) must be the MODE, and nearly all mass
        # must sit in the two low-energy states (the (0,1) local minimum at
        # E=-1 is a legitimate annealer outcome; the E=0 states are not)
        frac_ground = float((out == [1.0, 0.0]).all(axis=1).mean())
        frac_local = float((out == [0.0, 1.0]).all(axis=1).mean())
        assert frac_ground > frac_local
        assert frac_ground + frac_local > 0.9
        assert adapter.chain_break_fraction < 0.2

    def test_one_search_per_structure(self):
        """VERDICT r4 #1 done-criterion: a training run makes one embedding
        search per QUBO structure — repeated sampling never re-searches."""
        fake = FakeHardwareSampler(chimera_graph(2), topology=CHIMERA_TOPO,
                                   sweeps=20)
        adapter = StructuredQPUSampler(fake)
        rng = np.random.default_rng(0)
        Q3 = jnp.asarray(np.triu(rng.uniform(-1, 1, (4, 3, 3))).astype(np.float32))
        Q5 = jnp.asarray(np.triu(rng.uniform(-1, 1, (2, 5, 5))).astype(np.float32))
        for rep in range(3):
            adapter.sample_batch(jax.random.key(rep), Q3, 4)
            adapter.sample_batch(jax.random.key(10 + rep), Q5, 4)
        assert adapter.embedding_searches == 2  # one per structure (n=3, n=5)
        assert fake.calls == 3 * (4 + 2)  # one roundtrip per problem per call

    def test_diag_only_uses_trivial_structure(self):
        fake = FakeHardwareSampler(chimera_graph(1), topology=None, sweeps=120)
        adapter = StructuredQPUSampler(fake, topology=("chimera", 1, 1, 4))
        Q = jnp.asarray(np.diag([-1.0, 2.0, -3.0]).astype(np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 16))[0]
        assert adapter.embedding_searches == 1
        # linear-only problems embed 1:1 (no chains to break)
        assert adapter.chain_break_fraction == 0.0
        np.testing.assert_array_equal(out.mean(axis=0).round(), [1.0, 0.0, 1.0])

    def test_disk_cache_skips_search_across_instances(self, tmp_path):
        topo = CHIMERA_TOPO
        Q = jnp.asarray(np.triu(np.full((3, 3), 0.5, np.float32)))[None]
        a1 = StructuredQPUSampler(
            FakeHardwareSampler(chimera_graph(2), topology=topo, sweeps=20),
            cache_dir=tmp_path)
        a1.sample_batch(jax.random.key(0), Q, 2)
        assert a1.embedding_searches == 1
        a2 = StructuredQPUSampler(
            FakeHardwareSampler(chimera_graph(2), topology=topo, sweeps=20),
            cache_dir=tmp_path)
        a2.sample_batch(jax.random.key(1), Q, 2)
        assert a2.embedding_searches == 0  # warm disk cache, zero searches

    def test_copies_place_into_disjoint_blocks(self):
        fake = FakeHardwareSampler(chimera_graph(4),
                                   topology={"type": "chimera", "shape": [4, 4, 4]},
                                   sweeps=20)
        adapter = StructuredQPUSampler(fake, copies=4)
        embs = adapter._embeddings_for(4, False)
        assert len(embs) == 4 and adapter.embedding_searches == 1
        used = set()
        for e in embs:
            qubits = {q for ch in e.values() for q in ch}
            assert not (qubits & used)
            used |= qubits
        Q = jnp.asarray(np.triu(np.full((4, 4), 0.2, np.float32)))[None]
        out = adapter.sample_batch(jax.random.key(0), Q, 10)
        assert out.shape == (1, 10, 4)
        assert fake.calls == 1  # ONE roundtrip for all four replicas
        assert adapter.reads_requested == 3  # ceil(10 / 4)

    def test_copies_deinterleave_read_major(self):
        fake = FakeHardwareSampler(chimera_graph(2), topology=CHIMERA_TOPO)
        adapter = StructuredQPUSampler(fake, copies=2)
        embs = adapter._embeddings_for(4, False)
        replica_of = {q: c for c, e in enumerate(embs)
                      for ch in e.values() for q in ch}

        def patterned(qdict, num_reads=1, **_):
            variables = sorted({q for ij in qdict for q in ij})
            rows = [[float((r * 2 + replica_of[q]) % 2) for q in variables]
                    for r in range(num_reads)]
            return FakeSampleSet(rows, variables)

        fake.sample_qubo = patterned
        Q = np.zeros((1, 4, 4), np.float32)
        Q[0, 0, 1] = 0.1  # coupling → clique structure, matching embs
        out = np.asarray(adapter.sample_batch(jax.random.key(0), jnp.asarray(Q), 4))[0]
        # sample r*k + c == read r's replica c
        np.testing.assert_array_equal(out[:, 0], [0.0, 1.0, 0.0, 1.0])

    def test_copies_reduce_with_warning_when_chip_small(self):
        fake = FakeHardwareSampler(chimera_graph(2), topology=CHIMERA_TOPO,
                                   sweeps=20)
        adapter = StructuredQPUSampler(fake, copies=5)
        Q = jnp.asarray(np.triu(np.full((5, 5), 0.3, np.float32)))[None]
        with pytest.warns(UserWarning, match="1 of 5"):
            out = adapter.sample_batch(jax.random.key(0), Q, 6)
        assert out.shape == (1, 6, 5)  # K5 block needs 2×2 cells: one block fits

    def test_oversized_problem_raises(self):
        fake = FakeHardwareSampler(chimera_graph(2), topology=CHIMERA_TOPO)
        adapter = StructuredQPUSampler(fake)
        Q = jnp.asarray(np.triu(np.full((40, 40), 0.1, np.float32)))[None]
        with pytest.raises(RuntimeError, match="oversized"):
            adapter.sample_batch(jax.random.key(0), Q, 2)

    def test_heuristic_path_without_declared_topology(self):
        fake = FakeHardwareSampler(chimera_graph(2), topology=None, sweeps=60)
        adapter = StructuredQPUSampler(fake)  # no properties → heuristic
        assert adapter._topology is None
        Q = jnp.asarray(np.array([[-2.0, 3.0], [0.0, -1.0]], np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 16))[0]
        assert out.shape == (16, 2) and adapter.embedding_searches == 1

    def test_requires_structured_sampler(self):
        with pytest.raises(TypeError, match="structured"):
            StructuredQPUSampler(types.SimpleNamespace(sample_qubo=None))

    def test_training_run_makes_one_search_total(self):
        """End-to-end DiscQBM training on fake hardware: qbmx models fuse
        the clamped and unclamped phases into ONE padded-size group call
        (shared-coupling contract), so a whole training run — batches,
        epochs, prediction — makes exactly ONE embedding search (the
        VERDICT r4 #1 done-criterion; the reference needs one per phase,
        ``src/model/faster_dqbm.py:152-165``)."""
        from qbmx.models.dqbm import DiscQBM
        from qbmx.train.loop import train_model

        fake = FakeHardwareSampler(chimera_graph(3),
                                   topology={"type": "chimera", "shape": [3, 3, 4]},
                                   sweeps=25)
        adapter = StructuredQPUSampler(fake)
        m = DiscQBM(dim_input=3, n_hidden_nodes=2, seed=0, sample_count=4,
                    restricted=False, sampler=adapter)
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (6, 3)).astype("float32")
        y = np.asarray([0, 1] * 3, dtype="float32")
        h = train_model(m, x, y, batch_size=3, learning_rate=0.1, epochs=2,
                        verbose=False)
        assert np.isfinite(h.nll_per_batch).all()
        assert adapter.embedding_searches == 1
        assert fake.calls > 2  # many roundtrips, constant searches


class TestRegistryIntegration:
    def test_first_party_default_needs_ocean(self):
        from qbmx.samplers.api import get_sampler

        with pytest.raises(NotImplementedError, match="Ocean"):
            get_sampler("Advantage_system4.1")

    def test_composite_opt_out_needs_ocean(self):
        from qbmx.samplers.api import get_sampler

        with pytest.raises(NotImplementedError, match="Ocean"):
            get_sampler("Advantage_system4.1", embedding="composite")

    def test_structured_adapter_is_a_qpu_sampler(self):
        fake = FakeHardwareSampler(chimera_graph(1), topology=None)
        adapter = StructuredQPUSampler(fake, topology=("chimera", 1, 1, 4))
        assert isinstance(adapter, QPUSampler) and adapter.jit_safe is False

    def test_cli_flags_reach_sampler_kwargs(self, tmp_path):
        from qbmx.cli import cdqbm_main, qbm_main
        from qbmx.cli._common import qpu_sampler_kwargs

        for mod in (qbm_main, cdqbm_main):
            flags = mod.build_parser().parse_args(
                ["--qpu_embedding", "composite",
                 "--embedding_cache", str(tmp_path)])
            assert flags.qpu_embedding == "composite"
            assert flags.embedding_cache == str(tmp_path)
            assert mod.build_parser().parse_args([]).qpu_embedding == "first_party"
        assert qpu_sampler_kwargs() is None  # defaults stay byte-identical
        assert qpu_sampler_kwargs(3, "composite", "d") == {
            "copies": 3, "embedding": "composite", "cache_dir": "d"}


# ---------------------------------------------------------------------------
# hardware-defect robustness (round-5 review findings)


class TestDefectRobustness:
    """Real chips have dead qubits/couplers and can even be disconnected;
    the pipeline must route around defects rather than program them."""

    @staticmethod
    def _remove_qubit(adj, q):
        adj = {k: set(v) for k, v in adj.items() if k != q}
        for nbrs in adj.values():
            nbrs.discard(q)
        return adj

    def test_partition_covers_disconnected_components(self):
        # two disjoint 4-cliques: farthest-point seeding must put one seed
        # in EACH component (unreachable = infinitely far), so no node is
        # left out of every region
        comp_a, comp_b = [0, 1, 2, 3], [10, 11, 12, 13]
        adj = {u: {v for v in comp_a if v != u} for u in comp_a}
        adj.update({u: {v for v in comp_b if v != u} for u in comp_b})
        regions = partition_target(adj, 2, seed=0)
        assert set().union(*regions) == set(adj)
        assert sorted(map(sorted, regions)) == [comp_a, comp_b]

    def test_embed_qubo_rejects_disconnected_chain(self):
        # path 0-1-2; chain (0, 2) skips qubit 1, so no intra-chain coupler
        # exists and the ferromagnetic penalty cannot hold the chain together
        adj = {0: {1}, 1: {0, 2}, 2: {1}}
        emb = {0: (0, 2)}
        assert verify_embedding(emb, [], adj)  # invalid per the checker
        with pytest.raises(ValueError, match="disconnected"):
            embed_qubo({(0, 0): 1.0}, emb, adj)

    def test_chimera_fast_path_skips_defective_blocks(self):
        # kill qubit 0 (inside cell block (0,0)): the clique fast path must
        # verify each block against the REAL adjacency and place the
        # embedding in a clean block instead of programming the dead qubit
        dead = chimera_index(0, 0, 0, 0, 4, 4, 4)
        adj = self._remove_qubit(chimera_graph(4), dead)
        fake = FakeHardwareSampler(adj, topology={"type": "chimera",
                                                  "shape": [4, 4, 4]},
                                   seed=0, sweeps=120)
        adapter = StructuredQPUSampler(fake)
        Q = jnp.asarray(np.diag([-1.0, 1.0, -1.0, 1.0, -1.0]).astype(np.float32)
                        + np.triu(np.full((5, 5), 0.1, np.float32), 1))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 32))[0]
        assert out.shape == (32, 5)
        assert adapter.embedding_searches == 1
        used = {q for e in adapter._embeddings_for(5, False)
                for chain in e.values() for q in chain}
        assert dead not in used and used <= set(adj)

    def test_short_delivery_is_padded_to_num_reads(self):
        # hardware may deliver fewer reads than requested: the adapter must
        # still return the full (num_reads, n) block (cycle-padded)
        class Short(FakeHardwareSampler):
            def sample_qubo(self, qdict, num_reads=1, **kw):
                ss = super().sample_qubo(qdict, num_reads=num_reads, **kw)
                ss.record.sample = ss.record.sample[:max(1, num_reads // 2)]
                return ss

        fake = Short(chimera_graph(2), topology=CHIMERA_TOPO, sweeps=40)
        adapter = StructuredQPUSampler(fake)
        Q = jnp.asarray(np.diag([-1.0, -1.0]).astype(np.float32))[None]
        out = np.asarray(adapter.sample_batch(jax.random.key(0), Q, 9))[0]
        assert out.shape == (9, 2)

        class ShortDuck:
            def sample_qubo(self, qdict, num_reads=1, **_):
                variables = sorted({q for ij in qdict for q in ij})
                return FakeSampleSet(
                    np.ones((max(1, num_reads // 3), len(variables))),
                    variables)

        base = QPUSampler(ShortDuck())
        out = np.asarray(base.sample_batch(jax.random.key(1),
                                           jnp.tile(Q, (3, 1, 1)), 8))
        assert out.shape == (3, 8, 2)
