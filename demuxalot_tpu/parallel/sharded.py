"""Barcode-sharded inference and EM over a device mesh (shard_map + psum).

Each device owns a contiguous barcode range: its calls, its logits rows, and
its slice of the posterior. Genotype tables (betas, variant→snp, mixing)
are replicated. Per EM iteration the only cross-device traffic is a psum of
the [n_variants, n_donors] M-step partials — the reference's driver-side
reduction of per-worker results (demuxalot/snp_counter.py:317-325,
demux.py:113-118) recast as an XLA collective over ICI/DCN.

The same code path runs on a single device (mesh of one), a multi-chip host,
or a multi-host slice (after ``parallel.mesh.init_distributed``).
"""
from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from jax.sharding import Mesh, PartitionSpec as PSpec
from jax import shard_map

from ..ops import likelihood as L
from ..ops import packing as P
from .mesh import (
    BARCODE_AXIS,
    allreduce_max_dims,
    local_shard_ids,
    make_mesh,
    put_global,
    put_row_shards,
    to_host,
)


def _build_estep(mesh, n_snps, n_local_barcodes, p_genotype_clip, call_chunk,
                 max_per_snp=0, with_probs=True):
    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)
    out_row = PSpec(BARCODE_AXIS, None)

    def estep(betas, addition, variant2snp, mixing, penalties, vid_b, cb_b, q_b):
        # prior + learnt addition fused into the one jitted program (the
        # round-4 engine paid a separate add dispatch per EM iteration)
        genotype_prob = L.probs_from_betas(
            betas + addition, variant2snp, n_snps, p_genotype_clip,
            max_per_snp=max_per_snp,
        )
        logits = L.barcode_logits(
            genotype_prob, mixing, penalties, vid_b, cb_b, q_b,
            n_local_barcodes, call_chunk=call_chunk,
        )
        if not with_probs:
            return logits
        return logits, jax.nn.softmax(logits, axis=-1)

    return shard_map(
        estep,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, shd, shd, shd),
        out_specs=(out_row, out_row) if with_probs else out_row,
        check_vma=False,  # chunked-scan carries mix varying/replicated values
    )


def _build_estep_pallas(
    mesh, n_snps, p_genotype_clip, sharded_tiled, pg, max_per_snp=0,
    donor_major=False, with_probs=True,
):
    """E-step with the fused Pallas kernel running per shard.

    ``donor_major=True`` takes betas/addition as [D, V] — the orientation
    the M-step kernel natively emits — so the EM loop runs transpose-free
    (parity with the single-device engine's donor-major state,
    models/demux.py). ``with_probs=False`` skips the device softmax for
    consumers that only need logits (the compact top-k path).
    """
    from ..ops.pallas_likelihood import tiled_logits_impl

    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)
    out_row = PSpec(BARCODE_AXIS, None)
    st = sharded_tiled
    interpret = jax.default_backend() != "tpu"

    def estep(betas, addition, variant2snp, mixing_sl, penalties_p,
              vid, seg_group, q, bounds, suboff):
        total = betas + addition
        if donor_major:
            genotype_prob = L.probs_from_betas_donor_major(
                total, variant2snp, p_genotype_clip, max_per_snp
            )
        else:
            genotype_prob = L.probs_from_betas(
                total, variant2snp, n_snps, p_genotype_clip, max_per_snp=max_per_snp
            )
        out = tiled_logits_impl(
            genotype_prob, mixing_sl, penalties_p,
            vid[0], seg_group[0], q[0], bounds[0], suboff[0],
            n_super=st.n_super, tbs=st.tbs, tb=st.tile_barcodes, tc=st.chunk_calls,
            band_specs=st.band_specs,
            interpret=interpret,
            donor_major=donor_major,
        )
        logits = out[: st.n_barcodes_per_shard, :pg]
        if not with_probs:
            return logits
        return logits, jax.nn.softmax(logits, axis=-1)

    return shard_map(
        estep,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, shd, shd, shd, shd, shd),
        out_specs=(out_row, out_row) if with_probs else out_row,
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )


def _build_mstep(mesh, n_variants, n_genotypes, contribution_power, call_chunk):
    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)

    def mstep(posterior, anchor, vid_v, cb_v, q_v):
        partial_addition = L.genotype_addition_from_posteriors(
            posterior, vid_v, cb_v, q_v, n_variants, n_genotypes, contribution_power,
            call_chunk=call_chunk,
        )
        # anchor damping folded into the program (scalar 1.0 when unused)
        return jax.lax.psum(partial_addition, BARCODE_AXIS) * anchor

    return shard_map(
        mstep,
        mesh=mesh,
        in_specs=(PSpec(BARCODE_AXIS, None), rep, shd, shd, shd),
        out_specs=rep,
        check_vma=False,  # chunked-scan carries mix varying/replicated values
    )


def _build_mstep_pallas(
    mesh, layout, n_variants, n_genotypes, contribution_power,
    donor_major_out=False,
):
    """M-step with the fused Pallas kernel running per shard, psum-merged."""
    from ..ops.pallas_mstep import tiled_mstep_impl

    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)
    interpret = jax.default_backend() != "tpu"

    def mstep(posterior, anchor, cb_global, vl, q, bounds, suboff):
        partial_addition = tiled_mstep_impl(
            posterior, cb_global[0], vl[0], q[0], bounds[0], suboff[0],
            n_variants=n_variants, n_genotypes=n_genotypes,
            tv=layout.tile_variants, tc=layout.chunk_calls,
            sps=layout.subtiles_per_super,
            contribution_power=contribution_power,
            interpret=interpret,
            donor_major_out=donor_major_out,
        )
        return jax.lax.psum(partial_addition, BARCODE_AXIS) * anchor

    return shard_map(
        mstep,
        mesh=mesh,
        in_specs=(PSpec(BARCODE_AXIS, None), rep, shd, shd, shd, shd, shd),
        out_specs=rep,
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )


class ColumnDataset:
    """Layout-facing dataset over raw call columns (benchmarks/dry runs).

    Mirrors exactly the slice of :class:`~..models.demux.PackedCalls` the
    shard layout builder consumes — barcode-major sorted ``(cb, vid, q)``
    columns plus the shard-layout cache dict — so synthetic workloads can
    drive ``ShardedDemultiplexer``'s layout internals without BAM/genotype
    fixtures. Product code always uses PackedCalls.
    """

    def __init__(self, cb: np.ndarray, vid: np.ndarray, q: np.ndarray):
        order = np.argsort(cb, kind="stable")
        self._cols = (
            np.ascontiguousarray(cb[order], dtype=np.int32),
            np.ascontiguousarray(vid[order], dtype=np.int32),
            np.ascontiguousarray(q[order], dtype=np.float32),
        )
        self._sharded_layouts: dict = {}

    def calls_by_barcode(self):
        return self._cols


class ShardedDemultiplexer:
    """Multi-device Demultiplexer: same results, barcode-sharded execution."""

    contribution_power = 2.0
    call_chunk = L.DEFAULT_CALL_CHUNK
    use_pallas: Optional[bool] = None  # None = auto (on TPU backends)
    # E-step tiles: (64, 1024) measured best on v5e (benchmarks/exp_group.py)
    pallas_tile_barcodes = 64
    pallas_chunk_calls = 1024
    # M-step chunk: variants average fewer calls per segment than barcodes,
    # so the smaller chunk keeps group padding modest
    mstep_chunk_calls = 512

    def __init__(self, mesh: Optional[Mesh] = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        # shard-layout cache accounting (layouts themselves live on the
        # PackedCalls dataset; see _shard_inputs): predict-after-learn on
        # the same dataset must re-tile nothing — tests assert via these
        self.layout_cache_hits = 0
        self.layout_cache_misses = 0

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size

    def _mesh_key(self) -> tuple:
        return (
            tuple(int(d.id) for d in self.mesh.devices.flat),
            jax.process_count(),
        )

    @staticmethod
    def _as_packed(chromosome2compressed_snp_calls, genotypes):
        """Route every input through one PackedCalls (transient for dicts).

        Single pack/layout code path — the same construction the
        single-device engine uses (models/demux.py), so the sharded engine
        shares the host join/collapse AND the shard layout cache whenever
        the caller passes a pack-once dataset.
        """
        from ..models.demux import ensure_packed

        return ensure_packed(chromosome2compressed_snp_calls, genotypes)

    def _resolve_use_pallas(self) -> bool:
        flag = self.use_pallas
        if flag is None:
            return jax.default_backend() == "tpu"
        return bool(flag)

    # -- data placement ----------------------------------------------------
    def _barcodes_per_shard(self, n_barcodes: int) -> int:
        tb = self.pallas_tile_barcodes
        return -(-max(n_barcodes, self.n_shards) // (self.n_shards * tb)) * tb

    def _local_shard_ids(self) -> list:
        """Mesh positions this process's devices hold (all, when single-process)."""
        if jax.process_count() == 1:
            return list(range(self.n_shards))
        return local_shard_ids(self.mesh)

    def _put_helpers(self, my_shards):
        shd = jax.sharding.NamedSharding(self.mesh, PSpec(BARCODE_AXIS))

        def put_flat(flat, width):
            """Flat [n_local * width] layout -> globally sharded flat array."""
            two_d = flat.reshape(len(my_shards), width)
            blocks = {s: two_d[i] for i, s in enumerate(my_shards)}
            return put_row_shards(blocks, shd, (self.n_shards * width,))

        def put_stacked(stacked):
            """[n_local, ...] per-shard blocks -> [n_shards, ...] global array."""
            blocks = {s: stacked[i : i + 1] for i, s in enumerate(my_shards)}
            return put_row_shards(blocks, shd, (self.n_shards,) + tuple(stacked.shape[1:]))

        return put_flat, put_stacked

    def _shard_inputs(self, packed, n_barcodes, n_donors, n_variants, build_mstep):
        """Per-shard device layouts, cached on the PackedCalls dataset.

        The expensive pieces — the barcode-range split, the per-shard
        tiling, and the device upload of the stacked call tables — depend
        only on (calls, n_barcodes, mesh, tiling knobs, n_variants,
        n_donors). The E-step tiling is sized at the donor count's max
        pseudo-genotype width (``padded_pg``), exactly like the
        single-device ``PackedCalls.forward_layout``, so
        learn(doublet_prior=0) and predict(0.35) share ONE entry;
        mixing/penalty tables are cheap per-use uploads done in
        ``_make_estep``. E-step and M-step entries cache independently, so
        ``predict_posteriors`` after ``learn_genotypes`` re-tiles nothing.

        Multi-host safe and host-memory local exactly as before: each
        process keeps only the calls of its own barcode ranges, lays out
        only its own shards, and agrees on padded static dims through
        allgathered maxima.
        """
        per_shard = self._barcodes_per_shard(n_barcodes)
        use_pallas = self._resolve_use_pallas()
        my_shards = self._local_shard_ids()
        multi = jax.process_count() > 1
        mesh_key = self._mesh_key()
        cache = packed._sharded_layouts

        key_e = ("estep", mesh_key, n_barcodes, per_shard, use_pallas,
                 self.pallas_tile_barcodes, self.pallas_chunk_calls,
                 n_variants, n_donors)
        key_m = ("mstep", mesh_key, n_barcodes, per_shard, use_pallas,
                 self.mstep_chunk_calls, n_variants, n_donors)

        entry_e = cache.get(key_e)
        entry_m = cache.get(key_m) if build_mstep else None
        if entry_e is not None:
            self.layout_cache_hits += 1
        if build_mstep and entry_m is not None:
            self.layout_cache_hits += 1
        if entry_e is not None and (not build_mstep or entry_m is not None):
            return entry_e, entry_m

        # shared pre-pass for whichever entries are missing
        cb_s, vid_s, q_s = packed.calls_by_barcode()
        shard_starts = np.arange(self.n_shards + 1, dtype=np.int64) * per_shard
        bounds = np.searchsorted(cb_s, shard_starts)
        if multi:
            # keep only the rows this process's shards own (contiguous
            # barcode-major runs, concatenated in ascending shard order so
            # the result stays globally cb-sorted)
            ranges = [slice(bounds[s], bounds[s + 1]) for s in sorted(my_shards)]
            cb_s = np.concatenate([cb_s[r] for r in ranges]) if ranges else cb_s[:0]
            vid_s = np.concatenate([vid_s[r] for r in ranges]) if ranges else vid_s[:0]
            q_s = np.concatenate([q_s[r] for r in ranges]) if ranges else q_s[:0]
            bounds = np.searchsorted(cb_s, shard_starts)

        # one allgather fixes every static dim all processes must share
        counts = bounds[1:] - bounds[:-1]
        local_max_calls = int(counts[my_shards].max()) if len(my_shards) else 0
        (max_calls_per_shard,) = allreduce_max_dims([local_max_calls])
        put_flat, put_stacked = self._put_helpers(my_shards)

        if entry_e is None:
            self.layout_cache_misses += 1
            entry_e = self._build_estep_entry(
                cb_s, vid_s, q_s, n_barcodes, per_shard, my_shards, multi,
                max_calls_per_shard, use_pallas, n_variants, n_donors,
                put_flat, put_stacked,
            )
            cache[key_e] = entry_e
        if build_mstep and entry_m is None:
            self.layout_cache_misses += 1
            entry_m = self._build_mstep_entry(
                cb_s, vid_s, q_s, per_shard, my_shards, multi,
                max_calls_per_shard, use_pallas, n_variants, n_donors,
                put_stacked,
            )
            cache[key_m] = entry_m
        return entry_e, entry_m

    def _build_estep_entry(
        self, cb_s, vid_s, q_s, n_barcodes, per_shard, my_shards, multi,
        max_calls_per_shard, use_pallas, n_variants, n_donors,
        put_flat, put_stacked,
    ):
        device = P.device_pack_columns(
            cb_s, vid_s, q_s, n_barcodes, n_shards=self.n_shards,
            barcodes_per_shard=per_shard, build_arrays=not use_pallas,
            shard_ids=my_shards, per_shard_calls_floor=max_calls_per_shard,
        )
        entry = {"device": device, "tiled": None, "estep_fns": {}}
        if not use_pallas:
            # flat dual-sort layout feeds the XLA segment-sum paths (the
            # _v arrays serve the XLA M-step; same pack builds them)
            w = device.per_shard_calls
            entry.update(
                vid_b=put_flat(device.vid_b, w), cb_b=put_flat(device.cb_b, w),
                q_b=put_flat(device.q_b, w),
                vid_v=put_flat(device.vid_v, w), cb_v=put_flat(device.cb_v, w),
                q_v=put_flat(device.q_v, w),
            )
            return entry

        from ..ops.pallas_likelihood import padded_pg
        from ..ops.tiling import (
            banded_chunk_counts,
            cap_bands_to_grid,
            choose_banded_chunk_calls,
            choose_n_bands,
            chunk_group,
            tile_barcode_calls_sharded,
        )

        # sized at the donor count's max pseudo-genotype width so every
        # doublet prior shares this tiling (padding columns are no-ops)
        pgp_max = padded_pg(n_donors + n_donors * (n_donors - 1) // 2)
        chunk_floor = -(-max(max_calls_per_shard, 1) // self.pallas_chunk_calls)
        n_tiles_per_shard = per_shard // self.pallas_tile_barcodes
        n_bands = choose_n_bands(n_variants, n_donors) if n_variants else 1
        # deterministic across processes: derived only from agreed dims
        n_bands = cap_bands_to_grid(
            n_bands, n_tiles_per_shard, self.pallas_tile_barcodes, pgp_max
        )
        tc = self.pallas_chunk_calls
        band_floors = None
        if n_bands > 1:
            # chunk size and per-band widths derive from allgathered
            # values so every process builds identical static shapes
            tc = choose_banded_chunk_calls(
                max_calls_per_shard, n_tiles_per_shard, n_bands,
                self.pallas_chunk_calls, seg_rows=self.pallas_tile_barcodes,
            )
            if multi:
                local_counts = banded_chunk_counts(
                    cb_s, vid_s, per_shard, n_variants,
                    self.n_shards, n_bands, self.pallas_tile_barcodes, tc,
                )
                band_floors = allreduce_max_dims(
                    local_counts[my_shards].max(axis=0).tolist()
                )
        tiled = tile_barcode_calls_sharded(
            cb_s, vid_s, q_s, n_barcodes,
            n_shards=self.n_shards,
            tile_barcodes=self.pallas_tile_barcodes,
            chunk_calls=tc,
            pgp=pgp_max,
            barcodes_per_shard=per_shard,
            shard_ids=my_shards,
            # multi-host: consistent upper bounds (each tile can round
            # one chunk up, plus per-barcode group padding of up to
            # TB*(G-1) slots per tile) replace the cross-shard max no
            # single process can see; single-host keeps the exact max
            n_chunks_floor=(
                chunk_floor
                + n_tiles_per_shard
                * (1 + (self.pallas_tile_barcodes * (chunk_group(tc) - 1) + tc - 1) // tc)
                if multi else 0
            ),
            n_variants=n_variants or 0,
            n_bands=n_bands,
            band_width_floors=band_floors,
        )
        entry["tiled"] = tiled
        entry.update(
            pallas_vid=put_stacked(tiled.vid),
            pallas_cbl=put_stacked(tiled.seg_group),
            pallas_q=put_stacked(tiled.q),
            pallas_bounds=put_stacked(tiled.chunk_bounds),
            pallas_suboff=put_stacked(tiled.chunk_suboff),
        )
        return entry

    def _build_mstep_entry(
        self, cb_s, vid_s, q_s, per_shard, my_shards, multi,
        max_calls_per_shard, use_pallas, n_variants, n_donors, put_stacked,
    ):
        if not use_pallas:
            # XLA M-step reads the _v arrays of the E-step entry
            return {"layout": None, "mstep_fns": {}}

        from ..ops.pallas_mstep import ShardedMstepLayout, choose_tile_variants
        from ..ops.tiling import chunk_group

        mstep_chunk_floor = -(-max(max_calls_per_shard, 1) // self.mstep_chunk_calls)
        shard_of_call = cb_s // per_shard
        tv = choose_tile_variants(
            max_calls_per_shard, n_variants, chunk_calls=self.mstep_chunk_calls
        )
        mlayout = ShardedMstepLayout(
            cb_local=(cb_s - shard_of_call * per_shard).astype(np.int32),
            vid=vid_s,
            q=q_s,
            shard_of_call=shard_of_call,
            n_shards=self.n_shards,
            n_variants=n_variants,
            tile_variants=tv,
            chunk_calls=self.mstep_chunk_calls,
            shard_ids=my_shards,
            # see the E-step layout note: agreed upper bound (tile
            # rounding + per-variant group padding), multi-host only
            n_chunks_floor=(
                mstep_chunk_floor
                + -(-n_variants // tv)
                * (1 + (tv * (chunk_group(self.mstep_chunk_calls) - 1)
                        + self.mstep_chunk_calls - 1) // self.mstep_chunk_calls)
                if multi else 0
            ),
            n_genotypes=n_donors,
            n_barcodes_per_shard=per_shard,
        )
        return {
            "layout": mlayout,
            "mstep_fns": {},
            "mstep_cb": put_stacked(mlayout.cb_global),
            "mstep_vl": put_stacked(mlayout.vl),
            "mstep_q": put_stacked(mlayout.q),
            "mstep_bounds": put_stacked(mlayout.chunk_bounds),
            "mstep_suboff": put_stacked(mlayout.chunk_suboff),
        }

    def _replicate(self, *xs):
        rep = jax.sharding.NamedSharding(self.mesh, PSpec())
        return [put_global(np.asarray(x), rep) for x in xs]

    def _make_estep(self, entry, mixing, penalties, n_snps, p_genotype_clip,
                    max_per_snp=0, donor_major=False, with_probs=True):
        """Jitted E-step + its trailing args for one (mixing, penalties) use.

        The returned callable takes ``(betas, addition, variant2snp, *args)``
        — the prior+addition sum happens inside the program. Jitted
        closures cache on the layout entry (re-tracing a fresh closure per
        entry-point call would force a recompile every time); the
        mixing/penalty uploads are per-use and tiny.
        """
        pg = mixing.shape[1]
        tiled = entry["tiled"]
        if tiled is not None:
            from ..ops.pallas_likelihood import build_mixing_sl, padded_pg

            fn_key = ("pallas", n_snps, float(p_genotype_clip), pg,
                      max_per_snp, donor_major, with_probs)
            estep = entry["estep_fns"].get(fn_key)
            if estep is None:
                estep = jax.jit(
                    _build_estep_pallas(
                        self.mesh, n_snps, p_genotype_clip, tiled, pg,
                        max_per_snp=max_per_snp, donor_major=donor_major,
                        with_probs=with_probs,
                    )
                )
                entry["estep_fns"][fn_key] = estep
            pgp = padded_pg(pg)
            penalties_p = np.zeros((1, pgp), dtype=np.float32)
            penalties_p[0, :pg] = penalties
            mix_r, pen_r = self._replicate(build_mixing_sl(mixing), penalties_p)
            args = (
                mix_r, pen_r,
                entry["pallas_vid"], entry["pallas_cbl"], entry["pallas_q"],
                entry["pallas_bounds"], entry["pallas_suboff"],
            )
        else:
            fn_key = ("xla", n_snps, float(p_genotype_clip), max_per_snp,
                      int(self.call_chunk), with_probs)
            estep = entry["estep_fns"].get(fn_key)
            if estep is None:
                estep = jax.jit(
                    _build_estep(
                        self.mesh, n_snps, entry["device"].n_barcodes_per_shard,
                        p_genotype_clip, self.call_chunk, max_per_snp=max_per_snp,
                        with_probs=with_probs,
                    )
                )
                entry["estep_fns"][fn_key] = estep
            mix_r, pen_r = self._replicate(mixing, penalties)
            args = (mix_r, pen_r, entry["vid_b"], entry["cb_b"], entry["q_b"])
        return estep, args

    def _make_mstep(self, entry_e, entry_m, n_variants, n_genotypes,
                    donor_major=False):
        """Jitted M-step + trailing args; takes (posterior, anchor, *args)."""
        mlayout = entry_m["layout"]
        if mlayout is not None:
            fn_key = ("pallas", n_variants, n_genotypes,
                      float(self.contribution_power), donor_major)
            mstep = entry_m["mstep_fns"].get(fn_key)
            if mstep is None:
                mstep = jax.jit(
                    _build_mstep_pallas(
                        self.mesh, mlayout, n_variants, n_genotypes,
                        float(self.contribution_power), donor_major_out=donor_major,
                    )
                )
                entry_m["mstep_fns"][fn_key] = mstep
            args = (
                entry_m["mstep_cb"], entry_m["mstep_vl"], entry_m["mstep_q"],
                entry_m["mstep_bounds"], entry_m["mstep_suboff"],
            )
        else:
            fn_key = ("xla", n_variants, n_genotypes,
                      float(self.contribution_power), int(self.call_chunk))
            mstep = entry_m["mstep_fns"].get(fn_key)
            if mstep is None:
                mstep = jax.jit(
                    _build_mstep(
                        self.mesh, n_variants, n_genotypes,
                        float(self.contribution_power), self.call_chunk,
                    )
                )
                entry_m["mstep_fns"][fn_key] = mstep
            args = (entry_e["vid_v"], entry_e["cb_v"], entry_e["q_v"])
        return mstep, args

    # -- public API --------------------------------------------------------
    def _forward_sharded(
        self, chromosome2compressed_snp_calls, genotypes, barcode_handler,
        p_genotype_clip, doublet_prior, timings, want_probs=True,
    ):
        """Device (logits, probs-or-None) [padded_B, pg] + column names.

        ``want_probs=False`` builds the logits-only step program (no device
        softmax) for consumers like the compact top-k path.
        """
        from ..models import demux as _dm

        t_mark = time.perf_counter()
        mixing, column_names = L.pseudogenotype_mixing(genotypes.genotype_names, doublet_prior)
        penalties = L.doublet_penalties(genotypes.n_genotypes, doublet_prior)

        packed = self._as_packed(chromosome2compressed_snp_calls, genotypes)
        variant2snp = packed.variant2snp
        prior_betas = packed.betas_for(genotypes, add_data_prior=False)
        n_variants = prior_betas.shape[0]
        n_snps = int(variant2snp.max()) + 1 if n_variants else 0
        n_barcodes = barcode_handler.n_barcodes

        # SNP-sorted device variant space (windowed genotype-prob
        # denominators); logits are invariant to the renumbering
        reindex = packed.reindex
        prior_betas_sorted = reindex.permute_rows(prior_betas)
        t_mark = _dm._stage_mark(timings, "pack_s", t_mark)

        entry_e, _ = self._shard_inputs(
            packed, n_barcodes, genotypes.n_genotypes, n_variants,
            build_mstep=False,
        )
        betas_r, v2s_r, zero_r = self._replicate(
            prior_betas_sorted, reindex.variant2snp, np.float32(0.0)
        )
        estep, estep_args = self._make_estep(
            entry_e, mixing, penalties, n_snps, p_genotype_clip,
            max_per_snp=reindex.windowed_max_per_snp, with_probs=want_probs,
        )
        t_mark = _dm._stage_mark(timings, "layout_s", t_mark)
        if timings is not None:
            timings["h2d_bytes"] = _dm._flush_device([betas_r, v2s_r, *estep_args])
            t_mark = _dm._stage_mark(timings, "upload_flush_s", t_mark)

        out = estep(betas_r, zero_r, v2s_r, *estep_args)
        logits, probs = out if want_probs else (out, None)
        if timings is not None:
            _dm._flush_device([logits])
        _dm._stage_mark(timings, "forward_s", t_mark)
        return logits, probs, column_names

    def predict_posteriors(
        self,
        chromosome2compressed_snp_calls,
        genotypes,
        barcode_handler,
        p_genotype_clip: float = 0.01,
        doublet_prior: float = 0.35,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        from ..models import demux as _dm

        timings = _dm.STAGE_TIMINGS
        logits, probs, column_names = self._forward_sharded(
            chromosome2compressed_snp_calls, genotypes, barcode_handler,
            p_genotype_clip, doublet_prior, timings,
        )
        n_barcodes = barcode_handler.n_barcodes
        t_mark = time.perf_counter()
        if getattr(logits, "is_fully_addressable", True):
            # link-adaptive: one frame + host softmax over slow links, both
            # device frames otherwise — same policy as the single-device
            # engine (_materialize_logits_and_probs)
            logits_np, probs_np = _dm._materialize_logits_and_probs(logits, probs)
            logits, probs = logits_np[:n_barcodes], probs_np[:n_barcodes]
        else:
            logits_full = to_host(logits)
            probs_full = to_host(probs)
            if timings is not None:
                # padded-frame bytes, split per frame (matches the
                # single-device d2h_logits_bytes / d2h_probs_bytes keys)
                timings["d2h_logits_bytes"] = int(logits_full.nbytes)
                timings["d2h_probs_bytes"] = int(probs_full.nbytes)
            logits = logits_full[:n_barcodes]
            probs = probs_full[:n_barcodes]
        _dm._stage_mark(timings, "materialize_s", t_mark)

        logits_df = pd.DataFrame(logits, index=list(barcode_handler.ordered_barcodes), columns=column_names)
        logits_df.index.name = "BARCODE"
        probs_df = pd.DataFrame(probs, index=list(barcode_handler.ordered_barcodes), columns=column_names)
        probs_df.index.name = "BARCODE"
        return logits_df, probs_df

    def predict_posteriors_compact(
        self,
        chromosome2compressed_snp_calls,
        genotypes,
        barcode_handler,
        p_genotype_clip: float = 0.01,
        doublet_prior: float = 0.35,
        k: int = 4,
        include_logits: bool = False,
    ):
        """Link-frugal sharded inference: device top-k readback per shard.

        Sharded twin of ``Demultiplexer.predict_posteriors_compact`` (same
        exactness contract; see models/demux.py). top-k is per-row, so the
        reduction runs shard-local with zero collectives; at pod scale the
        per-host d2h drops from 4*n_pg to ~(8k+4) bytes per barcode — the
        difference between seconds and minutes of DCN per posterior frame.
        """
        from ..models import demux as _dm

        timings = _dm.STAGE_TIMINGS
        logits, _none, column_names = self._forward_sharded(
            chromosome2compressed_snp_calls, genotypes, barcode_handler,
            p_genotype_clip, doublet_prior, timings, want_probs=False,
        )
        n_barcodes = barcode_handler.n_barcodes
        k = _dm._validate_topk(k, len(column_names))
        top_vals, top_idx, lse = _dm._compact_topk(logits, k=k)
        t_mark = time.perf_counter()
        # *_full arrays keep the shard-padded rows: bytes_moved must count
        # the actual transfer; _build_compact_result slices to n_barcodes
        result = _dm._build_compact_result(
            column_names, barcode_handler.ordered_barcodes,
            to_host(top_vals), to_host(top_idx), to_host(lse),
            to_host(logits.astype(jnp.bfloat16)) if include_logits else None,
            n_barcodes, timings,
        )
        _dm._stage_mark(timings, "materialize_s", t_mark)
        return result

    def staged_genotype_learning(
        self,
        chromosome2compressed_snp_calls,
        genotypes,
        barcode_handler,
        n_iterations: int = 5,
        p_genotype_clip: float = 0.01,
        doublet_prior: float = 0.0,
        barcode_prior_logits: Optional[np.ndarray] = None,
        materialize_every_iteration: bool = True,
        damping: Optional[str] = None,
    ):
        """Sharded EM generator; yields (probs_df, debug_info) per iteration.

        ``materialize_every_iteration=False`` keeps intermediate posteriors
        on device and yields ``(None, None)`` for all but the final
        iteration — the fast path for callers that only need the result
        (device->host transfer of posteriors can dominate EM wall-clock).
        ``damping`` as in the single-device engine (models/demux.py):
        "anchor" masks M-step additions to prior-informed variants.
        """
        assert 0 <= doublet_prior < 1
        if damping not in (None, "anchor"):
            raise ValueError(f"damping must be None or 'anchor', got {damping!r}")
        from ..models import demux as _dm

        timings = _dm.STAGE_TIMINGS
        t_mark = time.perf_counter()
        mixing, column_names = L.pseudogenotype_mixing(genotypes.genotype_names, doublet_prior)
        penalties = L.doublet_penalties(genotypes.n_genotypes, doublet_prior)

        packed = self._as_packed(chromosome2compressed_snp_calls, genotypes)
        prior_betas = packed.betas_for(genotypes, add_data_prior=True)
        variant2snp = packed.variant2snp
        n_variants, n_genotypes = prior_betas.shape
        n_snps = int(variant2snp.max()) + 1 if n_variants else 0
        n_barcodes = barcode_handler.n_barcodes

        # SNP-sorted device variant space; the learnt addition maps back to
        # registry order at yield (reindex.unpermute_rows)
        reindex = packed.reindex
        prior_betas_sorted = reindex.permute_rows(prior_betas)
        t_mark = _dm._stage_mark(timings, "pack_s", t_mark)

        entry_e, entry_m = self._shard_inputs(
            packed, n_barcodes, n_genotypes, n_variants, build_mstep=True
        )
        max_per_snp = reindex.windowed_max_per_snp
        # with the Pallas kernels and the windowed denominator both
        # available, the EM state stays donor-major [D, V] across
        # iterations — the layout both kernels natively want (parity with
        # the single-device engine, models/demux.py)
        donor_major = (
            entry_e["tiled"] is not None
            and entry_m["layout"] is not None
            and max_per_snp > 0
        )
        prior_state = (
            np.ascontiguousarray(prior_betas_sorted.T) if donor_major
            else prior_betas_sorted
        )
        betas_r, v2s_r, addition_r = self._replicate(
            prior_state, reindex.variant2snp, np.zeros_like(prior_state)
        )

        estep, estep_args = self._make_estep(
            entry_e, mixing, penalties, n_snps, p_genotype_clip,
            max_per_snp=max_per_snp, donor_major=donor_major,
        )
        mstep, mstep_args = self._make_mstep(
            entry_e, entry_m, n_variants, n_genotypes, donor_major=donor_major
        )

        prior_sharding = jax.sharding.NamedSharding(self.mesh, PSpec(BARCODE_AXIS, None))
        if barcode_prior_logits is not None:
            n_padded = entry_e["device"].n_barcodes_padded
            padded_prior = np.zeros((n_padded, len(penalties)), dtype=np.float32)
            padded_prior[:n_barcodes] = barcode_prior_logits
            prior_dev = put_global(padded_prior, prior_sharding)

        if damping == "anchor":
            # prior-informed variants only (pre-data-prior betas; the packed
            # table is never all-zero), mapped to the device row order
            registry_mask = (
                np.asarray(genotypes.get_betas()).sum(axis=1) > 0
            ).astype(np.float32)
            device_mask = registry_mask[reindex.order]
            anchor_r = self._replicate(
                device_mask[None, :] if donor_major else device_mask[:, None]
            )[0]
        else:
            # scalar no-op; the multiply is folded into the M-step program
            anchor_r = self._replicate(np.float32(1.0))[0]
        t_mark = _dm._stage_mark(timings, "layout_s", t_mark)
        if timings is not None:
            timings["h2d_bytes"] = _dm._flush_device(
                [betas_r, v2s_r, addition_r, anchor_r, *estep_args, *mstep_args]
            )
            t_mark = _dm._stage_mark(timings, "upload_flush_s", t_mark)

        for iteration in range(n_iterations):
            logits_dev, probs_dev = estep(betas_r, addition_r, v2s_r, *estep_args)
            if iteration == 0 and barcode_prior_logits is not None:
                logits_dev = logits_dev + prior_dev
                probs_dev = jax.nn.softmax(logits_dev, axis=-1)

            if materialize_every_iteration or iteration == n_iterations - 1:
                if timings is not None:
                    _dm._flush_device([probs_dev])
                    t_mark = _dm._stage_mark(timings, "device_loop_s", t_mark)
                probs_np = to_host(probs_dev)[:n_barcodes]
                addition_np = to_host(addition_r)
                if donor_major:
                    addition_np = addition_np.T
                probs_df = pd.DataFrame(
                    probs_np, index=barcode_handler.ordered_barcodes, columns=column_names
                )
                debug_information = {
                    "barcode_logits": to_host(logits_dev)[:n_barcodes],
                    "genotype_prior": prior_betas,
                    "genotype_addition": reindex.unpermute_rows(addition_np),
                }
                if timings is not None:
                    timings["d2h_addition_bytes"] = int(addition_np.nbytes)
                    t_mark = _dm._stage_mark(timings, "materialize_s", t_mark)
                yield probs_df, debug_information
            else:
                yield None, None

            if iteration != n_iterations - 1:
                addition_r = mstep(probs_dev, anchor_r, *mstep_args)
        if timings is not None:
            _dm._flush_device([addition_r])
            _dm._stage_mark(timings, "device_loop_s", t_mark)

    def learn_genotypes(
        self,
        chromosome2compressed_snp_calls,
        genotypes,
        barcode_handler,
        n_iterations: int = 5,
        p_genotype_clip: float = 0.01,
        doublet_prior: float = 0.0,
        barcode_prior_logits: Optional[np.ndarray] = None,
        damping: Optional[str] = None,
    ):
        if damping == "auto":
            # same measured selector as the single-device engine
            # (models/demux.py): plain EM unless its confident assignments
            # disagree with the drift-proof anchored run. Pack once so both
            # runs share the host pack AND the shard-layout cache.
            from ..models.demux import auto_damping_select

            chromosome2compressed_snp_calls = self._as_packed(
                chromosome2compressed_snp_calls, genotypes
            )

            def learn_with(inner_damping):
                return self.learn_genotypes(
                    chromosome2compressed_snp_calls, genotypes, barcode_handler,
                    n_iterations=n_iterations, p_genotype_clip=p_genotype_clip,
                    doublet_prior=doublet_prior,
                    barcode_prior_logits=barcode_prior_logits,
                    damping=inner_damping,
                )

            return auto_damping_select(learn_with, genotypes.n_genotypes)
        *_, last = self.staged_genotype_learning(
            chromosome2compressed_snp_calls, genotypes, barcode_handler,
            n_iterations=n_iterations, p_genotype_clip=p_genotype_clip,
            doublet_prior=doublet_prior, barcode_prior_logits=barcode_prior_logits,
            materialize_every_iteration=False, damping=damping,
        )
        last_probs, debug = last
        learnt = genotypes._with_betas(genotypes.get_betas() + debug["genotype_addition"])
        return learnt, last_probs
