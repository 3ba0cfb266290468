"""Multi-chip reorder: shard_map over a device mesh, O(B/n) per device.

Reference analog: none — the reference is a single-process OpenMP tool
(SURVEY.md §2.3). This module is the TPU-native scale-out design, matching
the single-chip batch-accept round (reorder/engine.py) with every heavy
data structure sharded:

  * walkers are data-parallel over the mesh axis ("shard"): each device
    owns B/n contig walkers, their consensus windows, frames and batch
    accepts — all O(B/n) compute;
  * the k-mer dictionaries are key-sharded: device d holds a complete
    bucketed hash table over the keys whose hash routes to d. A probe is
    DISPATCHED to its owner with a capacity-limited all_to_all (the MoE
    dispatch pattern: sort by owner, position within group, drop overflow
    — a dropped probe only loses match candidates, the same grace the
    hash build gives overflowing keys);
  * packed read rows are range-sharded by rid: verification fetches
    candidate rows from their owners through a second capacity-limited
    all_to_all (request rids out, 32-byte rows back). The row's length
    word carries the claim flag, so claim state rides the fetch;
  * cross-device claim conflicts are resolved REPLICATED from one small
    all_gather of per-device claim proposals (match + seed rids, ~B*M
    ints — bytes O(B), compute O(B*M log) but trivially small); every
    device then applies identical updates to the replicated claimed
    bitmap (Np/8 bytes) while row claim bits are applied by owners only;
  * each device drains its own strided slice of the seed queue. Seed
    rows ride the row-fetch exchange, so seeding decisions use the
    walker state carried from the previous round (a walker that dies in
    round r reseeds in round r+1 — one-round lag vs single-chip).

Per-round collectives: 2 all_to_alls (probe dispatch + replies),
2 all_to_alls (row requests + rows), 1 all_gather (claim proposals).
All O(B/n) sized except the proposal gather (O(B) ints).
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
from . import multihost as mh

try:
    shard_map = jax.shard_map  # jax >= 0.6
except Exception:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

_OWNER_MULT = jnp.uint32(0x85EBCA6B)   # decorrelated from the table hash
_BIG = eng._BIG


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    # multi-host: spin up jax.distributed first so jax.devices() spans
    # every process's chips (ICI-major order — see parallel/multihost.py)
    mh.maybe_initialize()
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
    shift_chunk: int = 16
    accept_slots: int = 16
    capacity_factor: float = 2.0   # all_to_all slack over the uniform load

    def __post_init__(self):
        # same cap as ReorderConfig: an uncapped shift scan both dominates
        # round count and can exceed _roll_counts' select-chain coverage
        if self.max_shift == 0:
            self.max_shift = max(min(self.max_readlen // 2,
                                     P.MAX_SHIFT_CAP), 1)


def _owner_of_key(key: jnp.ndarray, n: int) -> jnp.ndarray:
    if n == 1:
        return jnp.zeros(key.shape, jnp.int32)
    lg = int(np.log2(n))
    return ((key * _OWNER_MULT) >> jnp.uint32(32 - lg)).astype(jnp.int32)


def _dispatch(values: jnp.ndarray, owner: jnp.ndarray, valid: jnp.ndarray,
              n: int, cap: int):
    """MoE-style capacity-limited dispatch table.

    values/owner/valid: (Q,) int32/int32/bool. Returns
      send  (n*cap,) int32 values laid out per destination (-1 empty)
      src   (n*cap,) int32 source index of each slot (-1 empty)
    Overflow beyond `cap` per destination is dropped.
    """
    Q = values.shape[0]
    key = jnp.where(valid, owner, n)            # invalid to the end
    idx = jnp.arange(Q, dtype=jnp.int32)
    ko, vo, io = jax.lax.sort((key, values, idx), num_keys=1)
    firsts = jnp.concatenate([jnp.array([True]), ko[1:] != ko[:-1]])
    # rank within the destination group
    grp_start = jnp.where(firsts, idx, 0)
    grp_start = jax.lax.cummax(grp_start)
    rank = idx - grp_start
    ok = (ko < n) & (rank < cap)
    pos = jnp.where(ok, ko * cap + rank, n * cap)
    send = jnp.full((n * cap + 1,), -1, jnp.int32).at[pos].set(vo)
    src = jnp.full((n * cap + 1,), -1, jnp.int32).at[pos].set(io)
    return send[:-1], src[:-1]


def _collect(replies: jnp.ndarray, src: jnp.ndarray, Q: int) -> jnp.ndarray:
    """Scatter exchange replies back to their source slots.

    replies: (n*cap, ...) aligned with the dispatch table; src as returned
    by _dispatch. Returns (Q, ...) with zeros where nothing returned."""
    tgt = jnp.where(src >= 0, src, Q)
    out_shape = (Q + 1,) + replies.shape[1:]
    return jnp.zeros(out_shape, replies.dtype).at[tgt].set(replies)[:-1]


def build_shard_dicts(packed: np.ndarray, lengths: np.ndarray,
                      windows, n: int):
    """Per-device hash dictionaries: keys split by owner hash; every
    device's table is built at a common bucket count so the stacked arrays
    shard evenly over the mesh. Keys are extracted from the packed 2-bit
    rows directly (no codes matrix)."""
    om = int(_OWNER_MULT)
    all_btab, all_rids, starts = [], [], []
    for spec in windows:
        ok = lengths >= spec.end
        rids = np.nonzero(ok)[0].astype(np.int32)
        keys = dct._window_keys_packed(packed[ok], spec.start)
        if n > 1:
            lg = int(np.log2(n))
            owner = ((keys.astype(np.uint64) * om) & 0xFFFFFFFF) >> (32 - lg)
        else:
            owner = np.zeros(len(keys), np.int64)
        per_dev_keys = [keys[owner == d] for d in range(n)]
        per_dev_rids = [rids[owner == d] for d in range(n)]
        max_keys = max((len(k) for k in per_dev_keys), default=1)
        # common sizes across devices
        npad = max(1 << max(max_keys - 1, 1).bit_length(), 64)
        uk_max = 1
        built = []
        for d in range(n):
            k, r = per_dev_keys[d], per_dev_rids[d]
            order = np.argsort(k, kind="stable")
            k, r = k[order], r[order]
            kp = np.concatenate([k, np.full(npad - len(k), 0xFFFFFFFF,
                                            np.uint32)])
            rp = np.concatenate([r, np.full(npad - len(r), -1, np.int32)])
            built.append((kp, rp))
            uk_max = max(uk_max, len(np.unique(k)))
        S = dct.table_buckets(uk_max)
        btabs, ridss = [], []
        for kp, rp in built:
            btab, rids_p = _build_table(kp, rp, S)
            btabs.append(btab)
            ridss.append(rids_p)
        all_btab.append(np.stack(btabs))      # (n, S, 3*SLOTS)
        all_rids.append(np.stack(ridss))      # (n, npad)
        starts.append(spec.start)
    return all_btab, all_rids, starts


def _build_table(keys: np.ndarray, rids: np.ndarray, S: int):
    """One bucketed open-hash table at fixed size S (host build, same
    placement rule as dct.build_hash_dicts)."""
    uk, kstarts, counts = np.unique(keys, return_index=True,
                                    return_counts=True)
    if len(uk) and uk[-1] == 0xFFFFFFFF and rids[kstarts[-1]] == -1:
        uk, kstarts, counts = uk[:-1], kstarts[:-1], counts[:-1]
    shift = 32 - int(np.log2(S))
    bkey = np.zeros((S, dct.SLOTS), np.uint32)
    bstart = np.zeros((S, dct.SLOTS), np.int32)
    bcount = np.zeros((S, dct.SLOTS), np.int32)
    h = ((uk * dct._HASH_MULT) >> np.uint32(shift)).astype(np.int64)
    # single-attempt placement (same rule as dct._build_hash_dicts)
    b = h % S
    order2 = np.argsort(b, kind="stable")
    tb = b[order2]
    first = np.concatenate([[True], tb[1:] != tb[:-1]])
    grp = np.cumsum(first) - 1
    first_idx = np.nonzero(first)[0]
    rank = np.arange(len(tb)) - first_idx[grp]
    fits = rank < dct.SLOTS
    ki = order2[fits]
    bkey[tb[fits], rank[fits]] = uk[ki]
    bstart[tb[fits], rank[fits]] = kstarts[ki]
    bcount[tb[fits], rank[fits]] = counts[ki]
    btab = np.concatenate([bkey, bstart.view(np.uint32),
                           bcount.view(np.uint32)], axis=1)
    return btab, rids


def build_dist_round(mesh: Mesh, cfg: DistConfig, starts: list[int],
                     Np: int, scan_rounds: int = 0):
    """Returns the jitted sharded round/flush.

    Sharded over "shard": walker state, per-device dicts (btab/rids),
    packed rows (rid range), seed queue slices, queue_pos/n_real (n,).
    Replicated: claimed bitmap, lengths.
    """
    n = mesh.devices.size
    C = cfg.candidates
    SC = cfg.shift_chunk
    D = len(starts)
    lay = eng.ProbeLayout(D, C, SC)
    M = min(cfg.accept_slots, lay.K)
    S_EMIT = M + 1
    Npl = Np // n
    lg_npl = int(np.log2(Npl))

    def a2a(x):
        if n == 1:
            return x
        return jax.lax.all_to_all(x, "shard", split_axis=0, concat_axis=0,
                                  tiled=True)

    def probe_local(btab, rids_local, keys, me):
        """Answer arriving probe keys from the local table. Returns
        (cand, valid): (Qr, C) global rids."""
        S = btab.shape[0]
        shift = 32 - int(np.log2(S))
        h = (keys.astype(jnp.uint32) * jnp.uint32(dct._HASH_MULT)) >> shift
        b = h & (S - 1)
        row = btab[b]                    # single home-bucket attempt
        krow = row[:, :dct.SLOTS]
        srow = row[:, dct.SLOTS:2 * dct.SLOTS].astype(jnp.int32)
        crow = row[:, 2 * dct.SLOTS:].astype(jnp.int32)
        hit = (krow == keys.astype(jnp.uint32)[:, None]) & (crow > 0)
        first_hit = hit & (jnp.cumsum(hit, axis=1) == 1)
        start = jnp.sum(jnp.where(first_hit, srow, 0), axis=1)
        count = jnp.sum(jnp.where(first_hit, crow, 0), axis=1)
        offs = jnp.arange(C, dtype=jnp.int32)
        nr = rids_local.shape[0]
        valid = offs[None, :] < jnp.minimum(count, C)[:, None]
        idx = jnp.minimum(start[:, None] + offs[None, :], nr - 1)
        cand = rids_local[idx]
        return jnp.where(valid & (cand >= 0), cand, -1)

    def round_fn(state, lengths, btabs, drids, seed_slice, claimed0,
                 maxshift, room):
        counts = state["counts"]          # (Bl, 4, Lb)
        ref_len = state["ref_len"]
        active = state["active"]
        shift_base = state["shift_base"]
        first_rid = state["first_rid"]
        lp0 = state["left_phase"]
        rows_local = state["rows"]        # (Npl, W+1) rid range shard
        claimed = state["claimed"]        # replicated bitmap
        qpos = state["queue_pos"]         # (1,) this device's queue cursor
        nq = state["n_queue"]             # (1,) live entries in my slice
        Bl = counts.shape[0]
        Lb = counts.shape[2]
        Wl = rows_local.shape[1] - 1
        me = jax.lax.axis_index("shard")
        nwords = Np // 32 + 2
        searching = active & room

        def claimed_bit(idx):
            w = claimed[idx >> 5]
            return ((w >> (idx & 31).astype(jnp.uint32)) & 1) == 1

        # ---- seed draw (from the previous round's walker state) ----
        inactive = ~active & room
        rank = jnp.cumsum(inactive) - 1
        qidx = qpos[0] + rank
        in_range = inactive & (qidx < nq[0])
        seed_rid = seed_slice[jnp.clip(qidx, 0, seed_slice.shape[0] - 1)]
        seed_try = in_range & ~claimed_bit(seed_rid)
        qpos = qpos + jnp.sum(in_range)

        # ---- probes ----
        frames, s_tot = eng.walker_frames(counts, ref_len, shift_base, SC)
        q, v = eng.walker_queries(frames, s_tot, ref_len, starts)

        hits = []
        for di in range(D):
            qk = q[:, :, di, :].reshape(-1)          # (Bl*SC*2,)
            vk = v[:, :, di, :].reshape(-1)
            Qn = qk.shape[0]
            capq = int(np.ceil(cfg.capacity_factor * Qn / n))
            owner = _owner_of_key(qk.astype(jnp.uint32), n)
            send, src = _dispatch(qk.astype(jnp.int32), owner,
                                  vk & searching[:, None, None]
                                  .repeat(SC, 1).repeat(2, 2).reshape(-1),
                                  n, capq)
            recv = a2a(send)
            cand_r = probe_local(btabs[di], drids[di],
                                 jnp.where(recv >= 0, recv, 0), me)
            cand_r = jnp.where((recv >= 0)[:, None], cand_r, -1)
            back = a2a(cand_r)
            cand_q = _collect(back, src, Qn)          # (Qn, C)
            hits.append(cand_q.reshape(Bl, SC, 2, C))
        # (Bl, SC, 2, D, C) -> K in ProbeLayout order
        cand = jnp.stack(hits, axis=3).reshape(Bl, lay.K)
        cvalid = cand >= 0

        # ---- top-M compaction ----
        prio = jnp.where(cvalid, -jnp.asarray(lay.pr_static)[None, :], -_BIG)
        _, idx_m = jax.lax.top_k(prio, M)
        cand_m = jnp.take_along_axis(cand, idx_m, axis=1)
        valid_m = jnp.take_along_axis(cvalid, idx_m, axis=1)
        k_o_m = jnp.asarray(lay.k_o.astype(np.int32))[idx_m]
        k_frame_m = jnp.asarray(lay.k_frame.astype(np.int32))[idx_m]
        s_m = shift_base[:, None] + jnp.asarray(lay.k_s.astype(np.int32))[idx_m]
        pr_m = jnp.asarray(lay.pr_static)[idx_m]

        # ---- row fetch exchange: M candidates + first_rid + seed rid ----
        req = jnp.concatenate(
            [cand_m.reshape(-1), first_rid, seed_rid], axis=0)
        req_valid = jnp.concatenate(
            [valid_m.reshape(-1), jnp.ones((Bl,), bool), seed_try])
        Qr = req.shape[0]
        capr = int(np.ceil(cfg.capacity_factor * Qr / n))
        owner_r = (jnp.clip(req, 0, Np - 1) >> lg_npl).astype(jnp.int32)
        send_r, src_r = _dispatch(req, owner_r, req_valid, n, capr)
        recv_r = a2a(send_r)
        lrow = jnp.clip(recv_r, 0, Np - 1) & (Npl - 1)
        rows_srv = rows_local[lrow]                   # (n*capr, W+1)
        rows_srv = jnp.where((recv_r >= 0)[:, None], rows_srv,
                             jnp.uint32(1 << 31))    # missing -> claimed
        rows_back = a2a(rows_srv)
        rows_all = _collect(rows_back, src_r, Qr)
        # un-fetched slots look claimed so they are never accepted
        fetched = _collect((src_r >= 0).astype(jnp.uint32), src_r, Qr) > 0
        rows_all = jnp.where(fetched[:, None], rows_all,
                             jnp.uint32(1 << 31))
        rows = rows_all[: Bl * M].reshape(Bl, M, Wl + 1)
        fr_rows = rows_all[Bl * M: Bl * M + Bl]
        seed_rows = rows_all[Bl * M + Bl:]

        # ---- verify (local, O(Bl)) ----
        lw = rows[..., Wl]
        claimed_row = (lw >> 31) == 1
        clen = (lw & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        rl = ref_len[:, None]
        lo = jnp.where(k_o_m == 0, 0, s_m)
        hi = jnp.where(k_o_m == 0, jnp.minimum(rl - s_m, clen),
                       jnp.minimum(rl + s_m, clen))
        t = jnp.where(k_o_m == 0, s_m, rl + s_m - clen)
        fr2 = frames.reshape(Bl, 2 * SC, -1)
        frow = jnp.take_along_axis(fr2, k_frame_m[:, :, None], axis=1)
        ham = jnp.zeros((Bl, M), jnp.int32)
        for w in range(Wl):
            d = frow[..., w] ^ rows[..., w]
            mm = (d | (d >> 1)) & eng._ODD
            mw = eng._prefix_word(jnp.clip(hi - 16 * w, 0, 16)) \
                & ~eng._prefix_word(jnp.clip(lo - 16 * w, 0, 16))
            ham = ham + jax.lax.population_count(mm & mw).astype(jnp.int32)
        ok = valid_m & ~claimed_row & (ham <= cfg.thresh) \
            & (t >= 0) & (hi > lo)

        # ---- dedup + t order (local) ----
        rid_eff = jnp.where(ok, cand_m, _BIG)
        slot_i = jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None, :], (Bl, M))
        rid_s, _, t_s, ko_s, clen_s, slot_s = jax.lax.sort(
            (rid_eff, pr_m, t, k_o_m, clen, slot_i), dimension=1, num_keys=2)
        firsts = jnp.concatenate(
            [jnp.ones((Bl, 1), bool), rid_s[:, 1:] != rid_s[:, :-1]], axis=1)
        keep_s = (rid_s != _BIG) & firsts
        tkey = jnp.where(keep_s, t_s, _BIG)
        (_, _, keep_f, rid_f, t_f, ko_f, clen_f, slot_f) = jax.lax.sort(
            (tkey, rid_s, keep_s, rid_s, t_s, ko_s, clen_s, slot_s),
            dimension=1, num_keys=2)
        rows_f = jnp.take_along_axis(rows, slot_f[:, :, None], axis=1)

        # ---- global claim resolution: one all_gather of proposals ----
        # priority classes: 0 = match, 1 = seed (matches beat seeds on the
        # same rid, matching the single-chip order of operations)
        prop_rid = jnp.concatenate(
            [jnp.where(keep_f, rid_f, _BIG).reshape(-1),
             jnp.where(seed_try, seed_rid, _BIG)])
        Ppd = prop_rid.shape[0]
        props = (jax.lax.all_gather(prop_rid, "shard", axis=0, tiled=True)
                 if n > 1 else prop_rid)
        Pn = props.shape[0]
        cls = jnp.tile(jnp.concatenate(
            [jnp.zeros((Bl * M,), jnp.int32), jnp.ones((Bl,), jnp.int32)]),
            n)
        gidx = jnp.arange(Pn, dtype=jnp.int32)
        ks, cs, gs = jax.lax.sort((props, cls, gidx), num_keys=3)
        firstp = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]])
        win_sorted = firstp & (ks != _BIG)
        _, win_all = jax.lax.sort((gs, win_sorted), num_keys=1)

        # replicated claimed-bitmap update for every winner
        win_rid = jnp.where(win_all, props, Np - 1)
        word = jnp.where(win_all, win_rid >> 5, nwords - 1)
        bit = jnp.where(win_all,
                        jnp.uint32(1) << (win_rid & 31).astype(jnp.uint32),
                        jnp.uint32(0))
        claimed = claimed.at[word].add(bit)
        # row claim flags: owners only
        mine = win_all & ((win_rid >> lg_npl) == me)
        lidx = jnp.where(mine, win_rid & (Npl - 1), Npl - 1)
        rflag = jnp.where(mine, jnp.uint32(1) << 31, jnp.uint32(0))
        dump = jnp.where(mine, lidx, Npl - 1)
        # separate dump column trick is unavailable (row Npl-1 is real), so
        # scatter zero flags for non-mine entries instead
        rows_local = rows_local.at[dump, Wl].add(rflag)

        # my verdict slices
        my0 = me * Ppd
        win_me = jax.lax.dynamic_slice_in_dim(win_all, my0, Ppd, 0)
        win = win_me[: Bl * M].reshape(Bl, M) & keep_f
        ok_seed = win_me[Bl * M:] & seed_try

        matched_any = win.any(axis=1)
        t_roll = jnp.max(jnp.where(win, t_f, 0), axis=1)

        # ---- batched consensus update (O(Bl)) ----
        live = jnp.arange(Lb)[None, None, :] < ref_len[:, None, None]
        rolled0 = eng._roll_counts(counts * live, t_roll)
        len0 = jnp.maximum(ref_len - t_roll, 0)

        def add_slot(j, carry):
            rolled, new_len = carry
            rj = jax.lax.dynamic_index_in_dim(rows_f, j, 1, False)[:, :Wl]
            lj = jax.lax.dynamic_index_in_dim(clen_f, j, 1, False)
            koj = jax.lax.dynamic_index_in_dim(ko_f, j, 1, False)
            tj = jax.lax.dynamic_index_in_dim(t_f, j, 1, False)
            wj = jax.lax.dynamic_index_in_dim(win, j, 1, False)
            pkj = jnp.where((koj == 1)[:, None],
                            bits.revcomp_packed(rj, lj), rj)
            dj = jnp.where(wj, t_roll - tj, 0)
            pkj = bits.shift_bases_left(pkj, dj, Lb)
            ohj = eng._onehot_read(bits.unpack(pkj, Lb), lj - dj)
            rolled = rolled + jnp.where(wj[:, None, None], ohj, 0)
            new_len = jnp.maximum(new_len, jnp.where(wj, lj - dj, 0))
            return rolled, new_len

        rolled, new_len = jax.lax.fori_loop(0, M, add_slot, (rolled0, len0))
        counts = jnp.where(matched_any[:, None, None], rolled, counts)
        ref_len = jnp.where(matched_any, new_len, ref_len)
        shift_base = jnp.where(matched_any, 0, shift_base)

        # ---- death / left phase ----
        left_phase = lp0
        missed = searching & ~matched_any
        shift_base = jnp.where(missed, shift_base + SC, shift_base)
        death = missed & (shift_base > maxshift)
        start_left = death & ~left_phase
        active = active & ~(death & left_phase)
        left_phase = left_phase | start_left
        shift_base = jnp.where(start_left, 0, shift_base)
        fr_len = (fr_rows[:, Wl] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        fr_rc = bits.revcomp_packed(fr_rows[:, :Wl], fr_len)
        fr_counts = eng._onehot_read(bits.unpack(fr_rc, Lb), fr_len)
        counts = jnp.where(start_left[:, None, None], fr_counts, counts)
        ref_len = jnp.where(start_left, fr_len, ref_len)

        # ---- apply seeds ----
        seed_len = (seed_rows[:, Wl] & jnp.uint32(0x7FFFFFFF)
                    ).astype(jnp.int32)
        seed_cnt = eng._onehot_read(bits.unpack(seed_rows[:, :Wl], Lb),
                                    seed_len)
        counts = jnp.where(ok_seed[:, None, None], seed_cnt, counts)
        ref_len = jnp.where(ok_seed, seed_len, ref_len)
        shift_base = jnp.where(ok_seed, 0, shift_base)
        active = active | ok_seed
        left_phase = jnp.where(ok_seed, False, left_phase)
        first_rid = jnp.where(ok_seed, seed_rid, first_rid)

        # ---- emissions (packed like the single-chip round) ----
        tw = jnp.where(win, t_f, 0)
        cm = jax.lax.cummax(tw, axis=1)
        prev = jnp.concatenate([jnp.zeros((Bl, 1), tw.dtype), cm[:, :-1]],
                               axis=1)
        delta = tw - prev
        flagv = jnp.where(lp0[:, None], 2, 1)
        meta = jnp.where(win, delta + (flagv << 16) + (ko_f << 24), 0)
        emit_m = jnp.stack([jnp.where(win, rid_f, -1), meta], axis=-1)
        zero = jnp.zeros((Bl,), jnp.int32)
        emit_seed = jnp.stack(
            [jnp.where(ok_seed, seed_rid, -1), zero], axis=-1)[:, None, :]
        emit = jnp.concatenate([emit_seed, emit_m], axis=1)

        new_state = dict(counts=counts, ref_len=ref_len, active=active,
                         shift_base=shift_base, first_rid=first_rid,
                         left_phase=left_phase, rows=rows_local,
                         claimed=claimed, queue_pos=qpos, n_queue=nq)
        return new_state, emit.astype(jnp.int32)

    CAP = FLUSH_CAP = eng.FLUSH_ROUNDS * 3 + S_EMIT

    def flush_fn(state, lengths, btabs, drids, seed_slice, maxshift):
        Bl = state["counts"].shape[0]
        buf0 = jnp.full((Bl, CAP + 1, 2), -1, jnp.int32)
        cnt0 = jnp.zeros((Bl,), jnp.int32)
        bidx = jnp.arange(Bl)[:, None]

        def body(carry, _):
            st, buf, cnt = carry
            room = cnt < CAP - S_EMIT
            st2, emit = round_fn(st, lengths, btabs, drids, seed_slice,
                                 None, maxshift, room)
            valid = emit[:, :, 0] >= 0
            rank = jnp.cumsum(valid, axis=1) - 1
            pos = jnp.where(valid, cnt[:, None] + rank, CAP)
            buf = buf.at[bidx, pos].set(emit)
            cnt = cnt + jnp.sum(valid, axis=1)
            return (st2, buf, cnt), None

        (state, buf, cnt), _ = jax.lax.scan(
            body, (state, buf0, cnt0), None, length=eng.FLUSH_ROUNDS)
        return state, buf[:, :CAP], cnt

    sh = Pspec("shard")
    rep = Pspec()
    state_spec = dict(counts=sh, ref_len=sh, active=sh, shift_base=sh,
                      first_rid=sh, left_phase=sh, rows=sh,
                      claimed=rep, queue_pos=sh, n_queue=sh)
    fn = flush_fn if scan_rounds else flush_fn
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(state_spec, rep, [sh] * D, [sh] * D, sh, rep),
        out_specs=(state_spec, sh, sh),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


class DistReorderEngine:
    """Multi-device counterpart of ReorderEngine: walkers DP, dictionaries
    and packed rows sharded, probe/row traffic over all_to_all."""

    ordered_emissions = True

    def __init__(self, packed: np.ndarray, lengths: np.ndarray,
                 cfg: DistConfig, mesh: Mesh | None = None):
        self.mesh = mesh or make_mesh()
        n = self.n = self.mesh.devices.size
        self.cfg = cfg
        self.N = packed.shape[0]
        self.W = packed.shape[1]
        self.Lb = self.W * bits.BASES_PER_WORD
        self.Np = max(1 << max(self.N - 1, 1).bit_length(), 64 * n)
        self.B = int(min(cfg.num_walkers,
                         max(8 * n, self.Np // 256)) // n * n)
        self.windows = dct.default_windows(cfg.max_readlen)
        self.btabs, self.drids, self.dict_starts = build_shard_dicts(
            packed, lengths, self.windows, n)
        packed_p = np.zeros((self.Np, self.W + 1), np.uint32)
        packed_p[: self.N, : self.W] = packed
        lengths_p = np.zeros(self.Np, np.int32)
        lengths_p[: self.N] = lengths
        packed_p[:, self.W] = lengths_p.view(np.uint32)
        packed_p[self.N:, self.W] |= np.uint32(1 << 31)
        self.packed = packed_p
        self.lengths = lengths_p
        self._flush = build_dist_round(self.mesh, cfg, self.dict_starts,
                                       self.Np)

    def _queue_slices(self, remaining: np.ndarray):
        """Strided split of the seed queue over devices, padded equal."""
        n = self.n
        slices = [remaining[d::n] for d in range(n)]
        cap = max((len(s) for s in slices), default=1)
        cap = max(cap, 1)
        out = np.full((n, cap), self.Np - 1, np.int32)
        nq = np.zeros((n, 1), np.int32)
        for d, s in enumerate(slices):
            out[d, : len(s)] = s
            nq[d, 0] = len(s)
        return out.reshape(n * cap), nq.reshape(n)

    def init_state(self):
        n = self.n
        nwords = self.Np // 32 + 2
        claimed = np.zeros(nwords, np.uint32)
        pad = np.zeros(self.Np, bool)
        pad[self.N:] = True
        claimed[: self.Np // 32] = np.packbits(
            pad, bitorder="little").view(np.uint32)
        m = self.mesh
        # every array enters the mesh with its final sharding so the state
        # builds correctly under multi-process meshes too (multihost.py)
        return dict(
            counts=mh.put_sharded(m, np.zeros((self.B, 4, self.Lb),
                                              np.int32)),
            ref_len=mh.put_sharded(m, np.zeros(self.B, np.int32)),
            active=mh.put_sharded(m, np.zeros(self.B, bool)),
            shift_base=mh.put_sharded(m, np.zeros(self.B, np.int32)),
            first_rid=mh.put_sharded(m, np.zeros(self.B, np.int32)),
            left_phase=mh.put_sharded(m, np.zeros(self.B, bool)),
            rows=mh.put_sharded(m, self.packed),
            claimed=mh.put_replicated(m, claimed),
            queue_pos=mh.put_sharded(m, np.zeros(n, np.int32)),
            n_queue=mh.put_sharded(m, np.zeros(n, np.int32)),
        )

    def run(self, max_rounds: int | None = None,
            progress=None) -> np.ndarray:
        """Full distributed reorder. Returns filtered walker-major
        (rid, flag, pos_delta, rc) rows like ReorderEngine.run."""
        stride = max(self.N // max(self.B, 1), 1)
        idx = np.arange(self.N, dtype=np.int32)
        so = (np.concatenate([idx[r::stride] for r in range(stride)])
              if self.N else idx)
        queue = so.astype(np.int32)
        state = self.init_state()
        qslice, nq = self._queue_slices(queue)
        m = self.mesh
        state["n_queue"] = mh.put_sharded(m, nq)
        lengths = mh.put_replicated(m, self.lengths)
        btabs = [mh.put_sharded(m, b.reshape(-1, b.shape[-1]))
                 for b in self.btabs]
        drids = [mh.put_sharded(m, r.reshape(-1)) for r in self.drids]
        maxshift = mh.put_replicated(m, np.int32(self.cfg.max_shift))
        chunks = []
        rounds = 0
        seed_dev = mh.put_sharded(m, qslice)
        while True:
            state, buf, cnt = self._flush(state, lengths, btabs, drids,
                                          seed_dev, maxshift)
            rounds += eng.FLUSH_ROUNDS
            chunks.append(eng._compact_emit(mh.to_host(buf)))
            emitted = int(mh.to_host(cnt).sum())
            any_active = bool(mh.to_host(state["active"]).any())
            claimed_np = np.unpackbits(
                mh.to_host(state["claimed"])[: self.Np // 32].view(np.uint8),
                bitorder="little")[: self.N].astype(bool)
            n_claimed = int(claimed_np.sum())
            qpos = mh.to_host(state["queue_pos"])
            nq_np = mh.to_host(state["n_queue"])
            drained = bool((qpos >= nq_np).all())
            if progress is not None:
                progress(n_claimed, self.N)
            if drained and not any_active and (emitted == 0
                                               or n_claimed >= self.N):
                break
            if max_rounds is not None and rounds >= max_rounds:
                break
            # endgame queue compaction (host), as in the single-chip run
            if n_claimed < self.N:
                remaining = queue[~claimed_np[queue]]
                if len(remaining) < 0.5 * max(int(nq_np.sum()), 1):
                    queue = remaining
                    qslice, nq = self._queue_slices(queue)
                    seed_dev = mh.put_sharded(m, qslice)
                    state["n_queue"] = mh.put_sharded(m, nq)
                    state["queue_pos"] = mh.put_sharded(
                        m, np.zeros(self.n, np.int32))
        return eng._emissions_from_chunks(chunks)
