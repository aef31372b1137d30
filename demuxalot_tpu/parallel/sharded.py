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

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from jax.sharding import Mesh, PartitionSpec as PSpec
from jax import shard_map

from ..native.hostops import stable_argsort, take3
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


def _build_estep(mesh, n_snps, n_local_barcodes, p_genotype_clip, call_chunk, max_per_snp=0):
    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)

    def estep(betas, variant2snp, mixing, penalties, vid_b, cb_b, q_b):
        genotype_prob = L.probs_from_betas(
            betas, variant2snp, n_snps, p_genotype_clip, max_per_snp=max_per_snp
        )
        logits = L.barcode_logits(
            genotype_prob, mixing, penalties, vid_b, cb_b, q_b,
            n_local_barcodes, call_chunk=call_chunk,
        )
        return logits, jax.nn.softmax(logits, axis=-1)

    return shard_map(
        estep,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, shd, shd, shd),
        out_specs=(PSpec(BARCODE_AXIS, None), PSpec(BARCODE_AXIS, None)),
        check_vma=False,  # chunked-scan carries mix varying/replicated values
    )


def _build_estep_pallas(mesh, n_snps, p_genotype_clip, sharded_tiled, pg, max_per_snp=0):
    """E-step with the fused Pallas kernel running per shard."""
    from ..ops.pallas_likelihood import tiled_logits_impl

    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)
    st = sharded_tiled
    interpret = jax.default_backend() != "tpu"

    def estep(betas, variant2snp, mixing_sl, penalties_p, vid, seg_group, q, bounds, suboff):
        genotype_prob = L.probs_from_betas(
            betas, variant2snp, n_snps, p_genotype_clip, max_per_snp=max_per_snp
        )
        out = tiled_logits_impl(
            genotype_prob, mixing_sl, penalties_p,
            vid[0], seg_group[0], q[0], bounds[0], suboff[0],
            n_super=st.n_super, tbs=st.tbs, tb=st.tile_barcodes, tc=st.chunk_calls,
            band_specs=st.band_specs,
            interpret=interpret,
        )
        logits = out[: st.n_barcodes_per_shard, :pg]
        return logits, jax.nn.softmax(logits, axis=-1)

    return shard_map(
        estep,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, shd, shd, shd, shd, shd),
        out_specs=(PSpec(BARCODE_AXIS, None), PSpec(BARCODE_AXIS, None)),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )


def _build_mstep(mesh, n_variants, n_genotypes, contribution_power, call_chunk):
    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)

    def mstep(posterior, vid_v, cb_v, q_v):
        partial_addition = L.genotype_addition_from_posteriors(
            posterior, vid_v, cb_v, q_v, n_variants, n_genotypes, contribution_power,
            call_chunk=call_chunk,
        )
        return jax.lax.psum(partial_addition, BARCODE_AXIS)

    return shard_map(
        mstep,
        mesh=mesh,
        in_specs=(PSpec(BARCODE_AXIS, None), shd, shd, shd),
        out_specs=rep,
        check_vma=False,  # chunked-scan carries mix varying/replicated values
    )


def _build_mstep_pallas(mesh, layout, n_variants, n_genotypes, contribution_power):
    """M-step with the fused Pallas kernel running per shard, psum-merged."""
    from ..ops.pallas_mstep import tiled_mstep_impl

    rep = PSpec()
    shd = PSpec(BARCODE_AXIS)
    interpret = jax.default_backend() != "tpu"

    def mstep(posterior, cb_global, vl, q, bounds, suboff):
        partial_addition = tiled_mstep_impl(
            posterior, cb_global[0], vl[0], q[0], bounds[0], suboff[0],
            n_variants=n_variants, n_genotypes=n_genotypes,
            tv=layout.tile_variants, tc=layout.chunk_calls,
            sps=layout.subtiles_per_super,
            contribution_power=contribution_power,
            interpret=interpret,
        )
        return jax.lax.psum(partial_addition, BARCODE_AXIS)

    return shard_map(
        mstep,
        mesh=mesh,
        in_specs=(PSpec(BARCODE_AXIS, None), shd, shd, shd, shd, shd),
        out_specs=rep,
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )


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

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size

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

    def _shard_inputs(self, barcode_calls, n_barcodes, mixing=None, penalties=None, n_variants=None,
                      build_mstep=None):
        """Build and place the per-shard device layouts.

        Multi-host safe and host-memory local: each process keeps only the
        calls of its own barcode ranges (the input table may already be
        pre-filtered to those rows — global tables are simply masked), lays
        out only its own shards, agrees on padded static dims with one
        scalar allgather, and assembles global arrays shard-by-shard.
        """
        per_shard = self._barcodes_per_shard(n_barcodes)
        use_pallas = self._resolve_use_pallas() and mixing is not None
        my_shards = self._local_shard_ids()
        multi = jax.process_count() > 1
        if build_mstep is None:
            build_mstep = n_variants is not None

        if multi:
            # keep only the rows this process's shards own
            shard_of = barcode_calls["compressed_cb"].astype(np.int64) // per_shard
            barcode_calls = barcode_calls[np.isin(shard_of, my_shards)]

        # one allgather fixes every static dim all processes must share
        counts = P.shard_call_counts(barcode_calls, self.n_shards, per_shard)
        local_max_calls = int(counts[my_shards].max()) if len(my_shards) else 0
        (max_calls_per_shard,) = allreduce_max_dims([local_max_calls])
        chunk_floor = -(-max(max_calls_per_shard, 1) // self.pallas_chunk_calls)
        mstep_chunk_floor = -(-max(max_calls_per_shard, 1) // self.mstep_chunk_calls)

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

        device = P.device_pack_barcode_calls(
            barcode_calls, n_barcodes, n_shards=self.n_shards, barcodes_per_shard=per_shard,
            build_arrays=not use_pallas, shard_ids=my_shards,
            per_shard_calls_floor=max_calls_per_shard,
        )
        arrays = {}
        if not use_pallas:
            # flat dual-sort layout feeds the XLA segment-sum paths
            w = device.per_shard_calls
            arrays.update(
                vid_b=put_flat(device.vid_b, w), cb_b=put_flat(device.cb_b, w),
                q_b=put_flat(device.q_b, w),
                vid_v=put_flat(device.vid_v, w), cb_v=put_flat(device.cb_v, w),
                q_v=put_flat(device.q_v, w),
            )

        tiled = None
        if use_pallas:
            from ..ops.pallas_likelihood import padded_pg
            from ..ops.tiling import choose_n_bands, chunk_group, tile_barcode_calls_sharded

            cb = barcode_calls["compressed_cb"].astype(np.int32)
            order = stable_argsort(cb)
            cb_sorted, vid_sorted, q_sorted = take3(
                order, cb, barcode_calls["variant_id"],
                barcode_calls["p_base_wrong"],
            )
            pg = mixing.shape[1]
            pgp = padded_pg(pg)
            from ..ops.tiling import (
                banded_chunk_counts,
                cap_bands_to_grid,
                choose_banded_chunk_calls,
            )

            n_tiles_per_shard = per_shard // self.pallas_tile_barcodes
            n_bands = (
                choose_n_bands(n_variants, mixing.shape[0]) if n_variants else 1
            )
            # deterministic across processes: derived only from agreed dims
            n_bands = cap_bands_to_grid(
                n_bands, n_tiles_per_shard, self.pallas_tile_barcodes, pgp
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
                        cb_sorted, vid_sorted, per_shard, n_variants,
                        self.n_shards, n_bands, self.pallas_tile_barcodes, tc,
                    )
                    band_floors = allreduce_max_dims(
                        local_counts[my_shards].max(axis=0).tolist()
                    )
            tiled = tile_barcode_calls_sharded(
                cb_sorted,
                vid_sorted,
                q_sorted,
                n_barcodes,
                n_shards=self.n_shards,
                tile_barcodes=self.pallas_tile_barcodes,
                chunk_calls=tc,
                pgp=pgp,
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
            from ..ops.pallas_likelihood import build_mixing_sl

            penalties_p = np.zeros((1, pgp), dtype=np.float32)
            penalties_p[0, :pg] = penalties
            arrays.update(
                pallas_vid=put_stacked(tiled.vid),
                pallas_cbl=put_stacked(tiled.seg_group),
                pallas_q=put_stacked(tiled.q),
                pallas_bounds=put_stacked(tiled.chunk_bounds),
                pallas_suboff=put_stacked(tiled.chunk_suboff),
            )
            rep = jax.sharding.NamedSharding(self.mesh, PSpec())
            arrays["pallas_mixing_sl"] = put_global(build_mixing_sl(mixing), rep)
            arrays["pallas_penalties_p"] = put_global(penalties_p, rep)

        if self._resolve_use_pallas() and build_mstep and n_variants is not None:
            # M-step kernel layout (variant-tiled per shard, local barcodes)
            from ..ops.pallas_mstep import ShardedMstepLayout, choose_tile_variants
            from ..ops.tiling import chunk_group

            cb = barcode_calls["compressed_cb"].astype(np.int32)
            shard_of_call = cb // per_shard
            tv = choose_tile_variants(
                max_calls_per_shard, n_variants, chunk_calls=self.mstep_chunk_calls
            )
            mlayout = ShardedMstepLayout(
                cb_local=(cb - shard_of_call * per_shard).astype(np.int32),
                vid=barcode_calls["variant_id"].astype(np.int32),
                q=barcode_calls["p_base_wrong"].astype(np.float32),
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
                n_genotypes=(mixing.shape[0] if mixing is not None else 0),
            )
            arrays.update(
                mstep_cb=put_stacked(mlayout.cb_global),
                mstep_vl=put_stacked(mlayout.vl),
                mstep_q=put_stacked(mlayout.q),
                mstep_bounds=put_stacked(mlayout.chunk_bounds),
                mstep_suboff=put_stacked(mlayout.chunk_suboff),
            )
            arrays["mstep_layout"] = mlayout

        return device, arrays, tiled

    def _replicate(self, *xs):
        rep = jax.sharding.NamedSharding(self.mesh, PSpec())
        return [put_global(np.asarray(x), rep) for x in xs]

    def _make_estep(self, device, arrays, tiled, n_snps, p_genotype_clip, pg, mix_r=None, pen_r=None,
                    max_per_snp=0):
        """Build the jitted E-step and its trailing argument list.

        The returned callable takes (betas, variant2snp, *args).
        """
        if tiled is not None:
            estep = jax.jit(
                _build_estep_pallas(
                    self.mesh, n_snps, p_genotype_clip, tiled, pg, max_per_snp=max_per_snp
                )
            )
            args = (
                arrays["pallas_mixing_sl"], arrays["pallas_penalties_p"],
                arrays["pallas_vid"], arrays["pallas_cbl"], arrays["pallas_q"],
                arrays["pallas_bounds"], arrays["pallas_suboff"],
            )
        else:
            estep = jax.jit(
                _build_estep(
                    self.mesh, n_snps, device.n_barcodes_per_shard,
                    p_genotype_clip, self.call_chunk, max_per_snp=max_per_snp,
                )
            )
            args = (mix_r, pen_r, arrays["vid_b"], arrays["cb_b"], arrays["q_b"])
        return estep, args

    # -- public API --------------------------------------------------------
    def predict_posteriors(
        self,
        chromosome2compressed_snp_calls,
        genotypes,
        barcode_handler,
        p_genotype_clip: float = 0.01,
        doublet_prior: float = 0.35,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        mixing, column_names = L.pseudogenotype_mixing(genotypes.genotype_names, doublet_prior)
        penalties = L.doublet_penalties(genotypes.n_genotypes, doublet_prior)

        # Demultiplexer.pack_calls (not P.pack_calls) so a PackedCalls
        # dataset reuses its host pack here too; shard layouts stay local
        from ..models.demux import Demultiplexer as _D

        variant2snp, prior_betas, _mol, barcode_calls = _D.pack_calls(
            chromosome2compressed_snp_calls, genotypes, add_data_prior=False
        )
        n_snps = int(variant2snp.max()) + 1 if len(variant2snp) else 0
        n_barcodes = barcode_handler.n_barcodes

        # SNP-sorted device variant space (windowed genotype-prob
        # denominators); logits are invariant to the renumbering
        reindex = P.VariantReindex.build(variant2snp)
        barcode_calls = reindex.remap_barcode_calls(barcode_calls)
        prior_betas_sorted = reindex.permute_rows(prior_betas)

        device, arrays, tiled = self._shard_inputs(
            barcode_calls, n_barcodes, mixing, penalties,
            n_variants=prior_betas.shape[0], build_mstep=False,
        )
        betas_r, v2s_r, mix_r, pen_r = self._replicate(
            prior_betas_sorted, reindex.variant2snp, mixing, penalties
        )

        estep, estep_args = self._make_estep(
            device, arrays, tiled, n_snps, p_genotype_clip, mixing.shape[1], mix_r, pen_r,
            max_per_snp=reindex.windowed_max_per_snp,
        )
        logits, probs = estep(betas_r, v2s_r, *estep_args)
        logits = to_host(logits)[:n_barcodes]
        probs = to_host(probs)[:n_barcodes]

        logits_df = pd.DataFrame(logits, index=list(barcode_handler.ordered_barcodes), columns=column_names)
        logits_df.index.name = "BARCODE"
        probs_df = pd.DataFrame(probs, index=list(barcode_handler.ordered_barcodes), columns=column_names)
        probs_df.index.name = "BARCODE"
        return logits_df, probs_df

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
        mixing, column_names = L.pseudogenotype_mixing(genotypes.genotype_names, doublet_prior)
        penalties = L.doublet_penalties(genotypes.n_genotypes, doublet_prior)

        from ..models.demux import Demultiplexer as _D

        variant2snp, prior_betas, _mol, barcode_calls = _D.pack_calls(
            chromosome2compressed_snp_calls, genotypes, add_data_prior=True
        )
        n_variants, n_genotypes = prior_betas.shape
        n_snps = int(variant2snp.max()) + 1 if n_variants else 0
        n_barcodes = barcode_handler.n_barcodes

        # SNP-sorted device variant space; the learnt addition maps back to
        # registry order at yield (reindex.unpermute_rows)
        reindex = P.VariantReindex.build(variant2snp)
        barcode_calls = reindex.remap_barcode_calls(barcode_calls)
        prior_betas_sorted = reindex.permute_rows(prior_betas)

        device, arrays, tiled = self._shard_inputs(
            barcode_calls, n_barcodes, mixing, penalties, n_variants=n_variants
        )
        betas_r, v2s_r, mix_r, pen_r = self._replicate(
            prior_betas_sorted, reindex.variant2snp, mixing, penalties
        )

        estep, estep_args = self._make_estep(
            device, arrays, tiled, n_snps, p_genotype_clip, mixing.shape[1], mix_r, pen_r,
            max_per_snp=reindex.windowed_max_per_snp,
        )
        if "mstep_layout" in arrays:
            mstep = jax.jit(
                _build_mstep_pallas(
                    self.mesh, arrays["mstep_layout"], n_variants, n_genotypes,
                    float(self.contribution_power),
                )
            )
            mstep_args = (
                arrays["mstep_cb"], arrays["mstep_vl"], arrays["mstep_q"],
                arrays["mstep_bounds"], arrays["mstep_suboff"],
            )
        else:
            mstep = jax.jit(
                _build_mstep(
                    self.mesh, n_variants, n_genotypes, float(self.contribution_power), self.call_chunk
                )
            )
            mstep_args = (arrays["vid_v"], arrays["cb_v"], arrays["q_v"])

        prior_sharding = jax.sharding.NamedSharding(self.mesh, PSpec(BARCODE_AXIS, None))
        if barcode_prior_logits is not None:
            n_padded = device.n_barcodes_padded
            padded_prior = np.zeros((n_padded, len(penalties)), dtype=np.float32)
            padded_prior[:n_barcodes] = barcode_prior_logits
            prior_dev = put_global(padded_prior, prior_sharding)

        anchor_r = None
        if damping == "anchor":
            # prior-informed variants only (pre-data-prior betas; the packed
            # table is never all-zero), mapped to the device row order
            registry_mask = (
                np.asarray(genotypes.get_betas()).sum(axis=1) > 0
            ).astype(np.float32)
            anchor_r = self._replicate(registry_mask[reindex.order][:, None])[0]

        genotype_addition = np.zeros_like(prior_betas)
        addition_r = self._replicate(genotype_addition)[0]

        for iteration in range(n_iterations):
            logits_dev, probs_dev = estep(betas_r + addition_r, v2s_r, *estep_args)
            if iteration == 0 and barcode_prior_logits is not None:
                logits_dev = logits_dev + prior_dev
                probs_dev = jax.nn.softmax(logits_dev, axis=-1)

            if materialize_every_iteration or iteration == n_iterations - 1:
                probs_np = to_host(probs_dev)[:n_barcodes]
                probs_df = pd.DataFrame(
                    probs_np, index=barcode_handler.ordered_barcodes, columns=column_names
                )
                debug_information = {
                    "barcode_logits": to_host(logits_dev)[:n_barcodes],
                    "genotype_prior": prior_betas,
                    "genotype_addition": reindex.unpermute_rows(to_host(addition_r)),
                }
                yield probs_df, debug_information
            else:
                yield None, None

            if iteration != n_iterations - 1:
                addition_r = mstep(probs_dev, *mstep_args)
                if anchor_r is not None:
                    addition_r = addition_r * anchor_r

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
            # disagree with the drift-proof anchored run
            from ..models.demux import auto_damping_select

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
