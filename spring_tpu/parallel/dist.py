"""Multi-chip reorder round: shard_map over a device mesh.

Reference analog: none — the reference is a single-process OpenMP tool
(SURVEY.md §2.3). This module is the TPU-native scale-out design:

  * walkers are data-parallel over the mesh axis ("dp"): each device owns
    B/n contig walkers and their consensus windows;
  * the bucketed hash dictionaries are range-sharded by bucket index (the
    tensor-parallel analog): device d owns buckets [d*S/n, (d+1)*S/n) of
    each dict; a probe is answered by whichever device owns that bucket
    (the rare second-probe that crosses a shard boundary is dropped — the
    same grace the hash build gives overflowing keys);
  * packed read rows are replicated in this version (claim flags are
    derived replicated, so every device applies identical row updates);
    sharding reads over HBM with an all_to_all candidate exchange is the
    planned upgrade for beyond-HBM datasets.

Collectives per round: one all_gather of the walker queries/frames (dp ->
everyone), one all_gather of per-device best candidates (the merge), after
which claim resolution, the claimed bitmap, and the seed queue are computed
replicated — identically on every device, so no further communication is
needed. This mirrors how the reference's lock-striped claims serialize
cross-thread contention (src/reorder.h:440-475) without any locks.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as Pspec

from .. import params as P
from ..ops import bits
from ..reorder import dictionary as dct
from ..reorder import engine as eng

try:
    shard_map = jax.shard_map  # jax >= 0.6
except Exception:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=("shard",))


@dataclass
class DistConfig:
    max_readlen: int
    num_walkers: int = P.REORDER_BATCH  # global walkers (divisible by mesh)
    candidates: int = P.DICT_PROBE_CANDIDATES
    thresh: int = P.THRESH_REORDER
    max_shift: int = 0

    def __post_init__(self):
        # same cap as ReorderConfig: an uncapped shift scan both dominates
        # round count and can exceed _roll_counts' select-chain coverage
        if self.max_shift == 0:
            self.max_shift = max(min(self.max_readlen // 2,
                                     P.MAX_SHIFT_CAP), 1)


def build_dist_round(mesh: Mesh, cfg: DistConfig, starts: list[int],
                     Np: int, nbuckets: list[int],
                     scan_rounds: int = 0):
    """Returns a jitted round over the mesh.

    state: counts/ref_len/active/shift_base [walker-sharded], claimed /
    queue_pos / rows [replicated]; btabs [bucket-sharded], rids/seed_order/
    lengths [replicated].
    """
    n = mesh.devices.size
    C = cfg.candidates
    D = len(starts)
    lay = eng.ProbeLayout(D, C)

    def probe_sharded(btab_local, rids, queries, me, S):
        """Hash probe answering only locally-owned buckets."""
        Sl = S // n
        shift = 32 - int(np.log2(S))
        flat = queries.reshape(-1)
        h = (flat * jnp.uint32(dct._HASH_MULT)) >> shift
        start = jnp.zeros(flat.shape, jnp.int32)
        count = jnp.zeros(flat.shape, jnp.int32)
        for attempt in range(2):
            b = ((h + attempt) & (S - 1)).astype(jnp.int32)
            local = b - me * Sl
            own = (local >= 0) & (local < Sl)
            row = btab_local[jnp.clip(local, 0, Sl - 1)]
            krow = row[:, :dct.SLOTS]
            srow = row[:, dct.SLOTS:2 * dct.SLOTS].astype(jnp.int32)
            crow = row[:, 2 * dct.SLOTS:].astype(jnp.int32)
            hit = (krow == flat[:, None]) & (crow > 0) & own[:, None]
            any_hit = hit.any(axis=1)
            slot = jnp.argmax(hit, axis=1)
            take = any_hit & (count == 0)
            start = jnp.where(take, jnp.take_along_axis(
                srow, slot[:, None], axis=1)[:, 0], start)
            count = jnp.where(take, jnp.take_along_axis(
                crow, slot[:, None], axis=1)[:, 0], count)
        offs = jnp.arange(C, dtype=jnp.int32)
        nr = rids.shape[0]
        valid = offs[None, :] < jnp.minimum(count, C)[:, None]
        idx = start[:, None] + offs[None, :]
        cand = jnp.take(rids, jnp.minimum(idx, nr - 1), axis=0)
        shape = (*queries.shape, C)
        return cand.reshape(shape), valid.reshape(shape)

    def round_fn(state, lengths, btabs, drids, seed_order, n_real,
                 maxshift):
        counts = state["counts"]          # (Bl, 4, Lb) local walkers
        ref_len = state["ref_len"]
        active = state["active"]
        shift_base = state["shift_base"]
        claimed = state["claimed"]        # replicated bitmap words
        packed = state["rows"]            # replicated (Np, W+1)
        Bl = counts.shape[0]
        Wl = packed.shape[1] - 1
        me = jax.lax.axis_index("shard")
        nwords = Np // 32 + 2

        def claimed_bit(idx):
            w = claimed[idx >> 5]
            return ((w >> (idx & 31).astype(jnp.uint32)) & 1) == 1

        def claim(cond, idx):
            word = jnp.where(cond, idx >> 5, nwords - 1)
            bit = jnp.where(cond,
                            jnp.uint32(1) << (idx & 31).astype(jnp.uint32),
                            jnp.uint32(0))
            rflag = jnp.where(cond, jnp.uint32(1) << 31, jnp.uint32(0))
            return (claimed.at[word].add(bit),
                    packed.at[jnp.where(cond, idx, Np - 1), Wl].add(rflag))

        frames, s_tot = eng.walker_frames(counts, ref_len, shift_base)
        q, v = eng.walker_queries(frames, s_tot, ref_len, starts)

        gath = lambda x: jax.lax.all_gather(x, "shard", axis=0, tiled=True)
        q_all = gath(q)                    # (B, SC, D, 2)
        v_all = gath(v)
        frames_all = gath(frames)          # (B, SC, 2, W)
        s_all = gath(s_tot)
        rl_all = gath(ref_len)
        act_all = gath(active)
        B_all = q_all.shape[0]

        hits_r, hits_v = [], []
        for di in range(D):
            rids, hit = probe_sharded(btabs[di], drids[di],
                                      q_all[:, :, di, :], me, nbuckets[di])
            hits_r.append(rids)
            hits_v.append(hit & v_all[:, :, di, :, None])
        cand = jnp.stack(hits_r, axis=2).reshape(B_all, lay.K)
        cvalid = jnp.stack(hits_v, axis=2).reshape(B_all, lay.K)
        cvalid &= (cand >= 0) & act_all[:, None]

        ok, t, pr, clen = eng.verify_candidates(
            frames_all, s_all, rl_all, cand, cvalid, packed,
            cfg.thresh, lay)
        matched_l, rid_l, t_l, rc_l, pr_l = eng.select_best(
            cand, pr, t, clen, lay)

        # merge per-device bests: min over devices by priority
        best = jnp.stack([pr_l, rid_l, t_l, rc_l], axis=-1)   # (B, 4)
        best_all = jax.lax.all_gather(best, "shard", axis=0)  # (n, B, 4)
        dev_sel = jnp.argmin(best_all[..., 0], axis=0)        # (B,)
        best_g = jnp.take_along_axis(
            best_all, dev_sel[None, :, None], axis=0)[0]      # (B, 4)
        pr_g, rid_g = best_g[:, 0], best_g[:, 1]
        t_g, rc_g = best_g[:, 2], best_g[:, 3]
        matched_g = pr_g != eng._BIG
        matched_g = eng.resolve_conflicts(matched_g, rid_g)
        rid_g = jnp.where(matched_g, rid_g, -1)

        # local slice of the global decisions
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, me * Bl, Bl, axis=0)
        matched = sl(matched_g)
        rid_sel, t_sel, rc_sel = sl(rid_g), sl(t_g), sl(rc_g)

        counts, ref_len = eng.apply_matches(
            counts, ref_len, matched, rid_sel, t_sel, rc_sel,
            packed, lengths)
        claimed, packed = claim(matched_g, jnp.clip(rid_g, 0, Np - 1))
        shift_base = jnp.where(matched, 0, shift_base)
        missed = active & ~matched
        shift_base = jnp.where(missed, shift_base + eng.SHIFT_CHUNK,
                               shift_base)
        active = active & ~(missed & (shift_base > maxshift))

        # seeding: computed replicated over all B walkers, applied locally
        act_all2 = gath(active)
        inactive_g = ~act_all2
        rank = jnp.cumsum(inactive_g) - 1
        qidx = state["queue_pos"] + rank
        in_range = inactive_g & (qidx < n_real)
        seed_rid_g = seed_order[jnp.clip(qidx, 0, Np - 1)]
        ok_seed_g = in_range & ~claimed_bit(seed_rid_g)
        claimed, packed = claim(ok_seed_g, seed_rid_g)
        queue_pos = state["queue_pos"] + jnp.sum(in_range)

        ok_seed = sl(ok_seed_g)
        seed_rid = sl(seed_rid_g)
        seed_cnt = eng.seed_counts_for(packed, lengths, seed_rid,
                                       counts.shape[2])
        counts = jnp.where(ok_seed[:, None, None], seed_cnt, counts)
        ref_len = jnp.where(ok_seed, lengths[seed_rid], ref_len)
        shift_base = jnp.where(ok_seed, 0, shift_base)
        active = active | ok_seed

        emit_rid = jnp.where(matched, rid_sel,
                             jnp.where(ok_seed, seed_rid, -1))
        emit = jnp.stack([emit_rid,
                          jnp.where(matched, 1, 0).astype(jnp.int32),
                          jnp.where(matched, t_sel, 0).astype(jnp.int32),
                          jnp.where(matched, rc_sel, 0).astype(jnp.int32)],
                         axis=-1)

        new_state = dict(counts=counts, ref_len=ref_len, active=active,
                         shift_base=shift_base, claimed=claimed,
                         queue_pos=queue_pos, rows=packed)
        return new_state, emit.astype(jnp.int32)

    if scan_rounds:
        def stepped(state, lengths, btabs, drids, seed_order, n_real,
                    maxshift):
            def body(st, _):
                return round_fn(st, lengths, btabs, drids, seed_order,
                                n_real, maxshift)
            return jax.lax.scan(body, state, None, length=scan_rounds)
        fn = stepped
        emit_spec = Pspec(None, "shard")      # (rounds, B, 4)
    else:
        fn = round_fn
        emit_spec = Pspec("shard")

    sh = Pspec("shard")
    rep = Pspec()
    state_spec = dict(counts=sh, ref_len=sh, active=sh, shift_base=sh,
                      claimed=rep, queue_pos=rep, rows=rep)
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(state_spec, rep, [sh] * D, [rep] * D, rep, rep, rep),
        out_specs=(state_spec, emit_spec),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


class DistReorderEngine:
    """Multi-device counterpart of ReorderEngine (walkers dp, dicts tp)."""

    emit_slots = 1   # one emission slot per walker per round

    def __init__(self, packed: np.ndarray, lengths: np.ndarray,
                 cfg: DistConfig, mesh: Mesh | None = None):
        self.mesh = mesh or make_mesh()
        n = self.mesh.devices.size
        self.cfg = cfg
        self.N = packed.shape[0]
        self.W = packed.shape[1]
        self.Lb = self.W * bits.BASES_PER_WORD
        self.Np = max(1 << max(self.N - 1, 1).bit_length(), 64 * n)
        self.B = int(min(cfg.num_walkers,
                         max(8 * n, self.Np // 32)) // n * n)
        self.windows = dct.default_windows(cfg.max_readlen)
        from ..io.packing import unpack_codes
        codes_np = unpack_codes(packed, cfg.max_readlen)
        dicts = dct.build_hash_dicts(codes_np, lengths, self.windows,
                                     pad_to_pow2=True)
        self.dict_starts = [d.start for d in dicts]
        self.nbuckets = [d.nbuckets for d in dicts]
        # bucket count must divide evenly over the mesh (pow2 / pow2)
        self.btabs = [np.asarray(d.btab) for d in dicts]
        self.drids = [np.asarray(d.rids) for d in dicts]
        packed_p = np.zeros((self.Np, self.W + 1), np.uint32)
        packed_p[: self.N, : self.W] = packed
        lengths_p = np.zeros(self.Np, np.int32)
        lengths_p[: self.N] = lengths
        packed_p[:, self.W] = lengths_p.view(np.uint32)
        packed_p[self.N:, self.W] |= np.uint32(1 << 31)
        self.packed = packed_p
        self.lengths = lengths_p
        self._round = build_dist_round(self.mesh, cfg, self.dict_starts,
                                       self.Np, self.nbuckets)
        self._flush = build_dist_round(self.mesh, cfg, self.dict_starts,
                                       self.Np, self.nbuckets,
                                       scan_rounds=eng.FLUSH_ROUNDS)

    def init_state(self):
        nwords = self.Np // 32 + 2
        claimed = np.zeros(nwords, np.uint32)
        pad = np.zeros(self.Np, bool)
        pad[self.N:] = True
        claimed[: self.Np // 32] = np.packbits(
            pad, bitorder="little").view(np.uint32)
        return dict(
            counts=jnp.zeros((self.B, 4, self.Lb), jnp.int32),
            ref_len=jnp.zeros((self.B,), jnp.int32),
            active=jnp.zeros((self.B,), bool),
            shift_base=jnp.zeros((self.B,), jnp.int32),
            claimed=jnp.asarray(claimed),
            queue_pos=jnp.zeros((), jnp.int32),
            rows=jnp.asarray(self.packed),
        )

    def seed_order(self):
        stride = max(self.N // max(self.B, 1), 1)
        idx = np.arange(self.N, dtype=np.int32)
        so = (np.concatenate([idx[r::stride] for r in range(stride)])
              if self.N else idx)
        return np.concatenate(
            [so, np.full(self.Np - len(so), self.Np - 1, np.int32)])

    def _args(self):
        return (jnp.asarray(self.lengths),
                [jnp.asarray(b) for b in self.btabs],
                [jnp.asarray(r) for r in self.drids],
                jnp.asarray(self.seed_order()),
                jnp.asarray(self.N, jnp.int32),
                jnp.asarray(self.cfg.max_shift, jnp.int32))

    def run(self, max_rounds: int | None = None,
            progress=None) -> np.ndarray:
        """Full distributed reorder; returns emissions (R*B, 4)."""
        state = self.init_state()
        args = self._args()
        chunks = []
        rounds = 0
        while True:
            state, emit = self._flush(state, *args)
            rounds += eng.FLUSH_ROUNDS
            buf = np.asarray(emit)            # (rounds, B, 4)
            chunks.append(buf.reshape(-1, 4))
            queue_pos = int(state["queue_pos"])
            any_active = bool(np.asarray(state["active"]).any())
            emitted = bool((buf[..., 0] >= 0).any())
            if progress is not None:
                progress(queue_pos, self.N)
            if queue_pos >= self.N and not any_active and not emitted:
                break
            if max_rounds is not None and rounds >= max_rounds:
                break
        return np.concatenate(chunks, axis=0)
