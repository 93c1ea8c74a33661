"""Static render/pipeline configuration.

The reference (ldyken53/gaussian-splatting-wgpu) configures its pipeline through
HTML controls and WGSL string substitution (reference: index.html:20-24,
src/renderer.ts:280, src/radix_sort/sort.ts:116-133) and hardcodes its numerical
magic constants inside the shaders (0.3 low-pass, 1.3 tan-fov clamp, 3-sigma
radius, 0.99 alpha clamp, 1/255 alpha floor, 1e-4 transmittance floor --
src/process_gaussians.wgsl, src/compute_tiles.wgsl:57-65).

TPU-native equivalent: one frozen, hashable dataclass that is *static under
jit*. Every shape-determining quantity (resolution, tile size, intersection
capacity) lives here so the whole pipeline compiles once with static shapes --
this replaces the reference's per-frame dynamic buffer allocation
(src/renderer.ts:439-441) and its mid-frame CPU readback of the intersection
count (src/exclusive_scan.ts:311-324).
"""

from __future__ import annotations

import dataclasses


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Image / tiling (reference: index.html:19-24 -- 800x800 canvas, tile 16).
    width: int = 800
    height: int = 800
    tile_size: int = 16

    # Static capacity of the (tile, depth)-keyed intersection stream. The
    # reference sizes this dynamically per frame from a GPU->CPU readback
    # (renderer.ts:419-441); we use a fixed padded capacity + overflow flag so
    # the pipeline is one jitted graph.
    max_intersections: int = 1 << 18
    # Static bound on tiles touched per Gaussian (rect area cap). Gaussians
    # whose screen rect covers more tiles are truncated (row-major prefix of
    # the rect) and flagged.
    max_tiles_per_gaussian: int = 64
    # Gaussians blended per vectorized block. P = tile_size**2 pixels are
    # blended against G = block_size Gaussians at a time.
    block_size: int = 16
    # Static per-tile intersection cap for the pure-jnp tiled rasterizer
    # (must be a multiple of block_size). The Pallas kernel has no such cap
    # (it loops the true dynamic range).
    max_per_tile: int = 2048

    # Splatting constants (reference: src/process_gaussians.wgsl:75-77,180,213
    # and src/compute_tiles.wgsl:60-63).
    scale_modifier: float = 1.0
    sh_degree: int = 3
    frustum_ndc_limit: float = 1.1
    lowpass: float = 0.3
    radius_sigma: float = 3.0
    eigen_clamp: float = 0.1
    alpha_clamp: float = 0.99
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1e-4

    # 'sort':    exact (tile, f32 depth) two-key sort over all N*K_max
    #            sentinel-padded candidates.
    # 'packed':  single-u32-key (tile | monotone float-bit depth) sort over
    #            N*K_max candidates -- ~2/3 the sort traffic.
    # 'tiered':  packed keys + tiered candidate pools (4 slots/Gaussian plus
    #            budgeted 16/K_max overflow pools) -- cuts the sort input
    #            ~4-6x; the production mode at 1M+ Gaussians.
    # 'scatter': cumsum offsets + scatter into the capacity buffer, then sort
    #            max_intersections keys (when N*K_max >> max_intersections).
    binning: str = "sort"
    # Upper bound on the projected 3-sigma screen radius in PIXELS (0 =
    # off). When a splat's projected footprint exceeds it, the 2D
    # covariance is isotropically shrunk so the radius lands exactly at the
    # bound. This bounds every tile rect to (floor(2r/tile)+2)^2 tiles BY
    # CONSTRUCTION, which is what makes a static max_tiles_per_gaussian
    # safe under training: splats drifting right in front of a camera
    # otherwise project near-full-screen rects (measured: 756 tiles at
    # 512^2 from a capture-statistics tail) and trip the K_max overflow
    # flag no matter the budget. The reference has no such case to handle
    # -- its rect walk is dynamically sized per frame
    # (src/renderer.ts:419-441) -- so this knob is the static-shape-native
    # answer, off by default for parity.
    max_screen_radius: float = 0.0
    # Exact ellipse-tile intersection culling of rect candidates whose peak
    # alpha in the tile is below alpha_min. Image- and gradient-invariant
    # (the blend skips those anyway); shrinks the intersection stream 2-4x.
    tile_culling: bool = True
    # 'tiered' binning shape: (K0, div1, div2). Every Gaussian gets K0
    # candidate slots; Gaussians with more surviving tiles go to overflow
    # pools of N/div1 rows x (4*K0 - K0) slots and N/div2 rows x
    # (K_max - 4*K0) slots. Budgets are checked against post-cull counts;
    # exceeding one sets the overflow flag. (8, 5, 16) measured fastest
    # with safe margins at 1080p/1M (the tau-AABB rect keeps per-Gaussian
    # tile counts small); raise div1/div2 headroom for fat-splat scenes.
    tier_spec: tuple = (8, 5, 16)
    # Two-level K for heavy-tailed scenes ('tiered' binning only). Real
    # captures contain a few thousand splats whose tile rects exceed any
    # practical uniform K_max (measured: up to 850 tiles at 1080p/tile32 on
    # the capture-statistics scene even after the 3DGS-5.2 big-splat
    # bound), and truncating them changes the image drastically (the
    # 144 px screen clamp costs 12 dB there -- scripts/probe_clamp_delta).
    # max_tiles_jumbo > 0 routes the top jumbo_tier_spec rows BY POST-CULL
    # TILE COUNT through dedicated jumbo tiers that enumerate up to
    # max_tiles_jumbo tiles per splat on their own small (rows, K_jumbo)
    # cull grid, while the base (N, K_max) machinery keeps its small K.
    # The gidk packing widens to ceil(log2 K_jumbo) bits, which bounds N:
    # K_jumbo 1024 needs N < 2^21. The reference sizes its rect walk
    # dynamically per frame (renderer.ts:419-441); this is the static-
    # shape equivalent: exact coverage, budgeted rows, overflow-flagged.
    max_tiles_jumbo: int = 0
    # ((k_hi, rows), ...): jumbo ladder over the count-ranked jumbo rows --
    # absolute ROW budgets (not divisors; jumbo membership is a scene tail,
    # not a fraction of N). E.g. ((256, 8192), (512, 2048), (1024, 512)).
    jumbo_tier_spec: tuple = ()
    # Rasterizer implementation: 'jnp' (pure XLA, differentiable by autodiff
    # or the shared analytic VJP) or 'pallas' (fused TPU kernel, custom VJP).
    impl: str = "jnp"
    # Gaussians per Pallas blend block (lane dimension; multiple of 128).
    pallas_block_size: int = 256
    # Run Pallas kernels in interpreter mode (CPU debugging / CI).
    pallas_interpret: bool = False
    # Optional per-tile segment alignment of the sorted stream (0/1 = off).
    # The Pallas kernels handle unaligned segments natively (two-sided
    # in-range masks; block-0 read-modify-write in the backward), so this is
    # a debug/experiment knob only -- it pads the stream ~10-25%.
    stream_align: int = 0
    # Gather-backward strategy (the slot-gradient -> per-Gaussian reduction):
    # 'variadic': one 11-operand lax.sort carrying the gradient rows as sort
    #             values -- fastest at runtime (50 ms vs 93 ms at 4.5M slots)
    #             but the sort expander dominates cold compile (~19 min for
    #             the full fwd+bwd graph at the bench shape).
    # 'permute':  2-operand sort_key_val(gidk, iota) + one 2-D take of the
    #             gradient rows -- ~40 ms/iter slower, compiles in minutes.
    # 'c64':      the variadic sort with f32 gradient rows PAIRED into
    #             complex64 values: identical payload bytes and exact f32
    #             results, but ceil(F/2)+1 operands instead of F+1 -- the
    #             sort expander's compile blowup scales with operand count.
    # 'bf16':     mixed-precision: slot gradients bf16-rounded and
    #             pair-packed BEFORE the sort (half the sorted payload,
    #             ~18 vs 31 ms at 4.1M lanes), summed in f32 by the packed
    #             Pallas segsum kernel; requires segment_sum='pallas' and
    #             grad_readout='bf16'.
    gather_backward: str = "variadic"
    # Final per-Gaussian gradient readout precision: 'f32' (exact) or 'bf16'
    # (sums stay f32; only the result of each Gaussian's gradient is rounded
    # to bf16 before the run-start take, halving the take's element count --
    # the standard mixed-precision-trainer contract).
    grad_readout: str = "f32"
    # Per-run reduction of the gid-major gradient stream in the gather
    # backward: 'doubling' = ceil(log2 K_max) masked shift+add passes in XLA
    # (~6 full HBM round-trips of the (F, max_I) stream at K_max=64);
    # 'pallas' = one-pass Pallas kernel doing the doubling in VMEM with a
    # cross-block carry (ops/pallas/segsum.py). Identical sums up to
    # f32 addition order. Interpreted on CPU via pallas_interpret.
    segment_sum: str = "doubling"
    # Gaussian-sharded fragment-exchange payload (parallel/gaussian_sharded):
    # 'f32' = raw feature rows; 'bf16' = bf16-pair-packed int32 rows through
    # the all_to_all both ways (fwd + gradient transpose), cutting the only
    # collective's bytes from 36+4 to 20+4 per fragment slot (~45% less ICI
    # traffic) at bf16 feature/gradient precision (straight-through).
    fragment_format: str = "f32"
    # MXU precision of the in-kernel blend matmuls (the triangular-cumsum
    # transmittance scan and the color/moments contractions). f32 inputs on
    # the TPU MXU decompose into bf16 passes: 'highest' = 6 passes (full
    # f32), 'high' = 3 passes (~f32 for these magnitudes), 'default' = 1
    # bf16 pass (measured ~1e-2 absolute image error -- do not use). The
    # cumsum matmul is the single largest FLOP consumer of both kernels
    # (P*G*G MACs per block), so 'high' buys back half its MXU time.
    matmul_precision: str = "highest"
    # Forward feature-stream format. 'f32': NUM_FEATURES f32 rows (exact).
    # 'packed16': 5 int32 rows -- means as u16 fixed-point pairs (~1/30 px
    # at 1080p, scale-adaptive), conic/color/opacity as bf16 pairs -- so the
    # biggest per-element cost of the frame, the slot-order feature gather,
    # moves 5/9 the elements. Quantizes the forward render (~0.4% alpha
    # noise); gradients are straight-through onto the f32 features.
    # Supported on every path; on the Gaussian-sharded one the packed rows
    # double as the fragment-exchange wire format (ops/stream16.py).
    stream_format: str = "f32"
    # Explicit packed16 quantization ranges (lox, sx, loy, sy) overriding the
    # ones derived from width/height. Set by parallel/sharding.local_tile_cfg
    # so a tile shard's LOCAL config (whose height is one band) unpacks the
    # stream with the GLOBAL image extent the features were quantized
    # against -- means are global pixel coordinates on every path.
    quant_ranges: tuple | None = None
    # Slot-gather element width for the packed16 stream. Hypothesis was
    # that XLA TPU gathers pay per ELEMENT, so pairing the 5 int32 rows
    # into 3 complex64 rows (lax.complex of bitcast halves) would move 3/5
    # the elements. MEASURED REJECTION on the chip (v5e, round 5,
    # scripts/micro_gather_c64.py at the bench shape 4.1M slots x 1M
    # table): the per-element rule does NOT extend to complex64 -- the c64
    # gather runs at 5.69 ns/elem vs i32's 1.06 (70.0 ms raw vs 21.6 ms
    # for all 5 rows; 38.0 ms with repack), i.e. 1.76x SLOWER end to end.
    # Bit-exactness IS verified on-chip incl. the denormal-patterned
    # (opacity|0) row -- the rejection is purely perf. 'i32' stays the
    # default; 'c64' is retained as a measured-negative ablation.
    slot_gather: str = "i32"

    # ---- derived (static) ----
    @property
    def tiles_x(self) -> int:
        return cdiv(self.width, self.tile_size)

    @property
    def tiles_y(self) -> int:
        return cdiv(self.height, self.tile_size)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_size * self.tile_size

    @property
    def padded_width(self) -> int:
        return self.tiles_x * self.tile_size

    @property
    def padded_height(self) -> int:
        return self.tiles_y * self.tile_size

    def __post_init__(self):
        if self.max_per_tile % self.block_size != 0:
            raise ValueError("max_per_tile must be a multiple of block_size")
        if self.tile_size < 1:
            raise ValueError("tile_size must be positive")
        if self.binning not in ("sort", "scatter", "packed", "tiered"):
            raise ValueError(f"unknown binning mode {self.binning!r}")
        if self.impl not in ("jnp", "pallas"):
            raise ValueError(f"unknown impl {self.impl!r}")
        if self.gather_backward not in ("variadic", "permute", "c64", "bf16"):
            raise ValueError(
                f"unknown gather_backward {self.gather_backward!r}"
            )
        if self.grad_readout not in ("f32", "bf16"):
            raise ValueError(f"unknown grad_readout {self.grad_readout!r}")
        if self.segment_sum not in ("doubling", "pallas"):
            raise ValueError(f"unknown segment_sum {self.segment_sum!r}")
        if self.gather_backward == "bf16" and (
            self.segment_sum != "pallas" or self.grad_readout != "bf16"
        ):
            raise ValueError(
                "gather_backward='bf16' keeps the gradient stream pair-"
                "packed end-to-end; it requires segment_sum='pallas' and "
                "grad_readout='bf16'"
            )
        if self.matmul_precision not in ("default", "high", "highest"):
            raise ValueError(
                f"unknown matmul_precision {self.matmul_precision!r}"
            )
        if self.stream_format not in ("f32", "packed16", "packed4"):
            raise ValueError(f"unknown stream_format {self.stream_format!r}")
        if self.slot_gather not in ("i32", "c64"):
            raise ValueError(f"unknown slot_gather {self.slot_gather!r}")
        if self.fragment_format not in ("f32", "bf16"):
            raise ValueError(
                f"unknown fragment_format {self.fragment_format!r}"
            )
        if self.stream_format in ("packed16", "packed4") and self.binning == "scatter":
            raise ValueError(
                "stream_format='packed16' needs the gidk stream for its "
                "fused backward; binning='scatter' does not produce one"
            )
        if self.max_tiles_jumbo:
            if self.binning != "tiered":
                raise ValueError(
                    "max_tiles_jumbo requires binning='tiered' (the jumbo "
                    "ladder extends the tiered candidate pools)"
                )
            if self.max_tiles_jumbo <= self.max_tiles_per_gaussian:
                raise ValueError(
                    "max_tiles_jumbo must exceed max_tiles_per_gaussian"
                )
            if self.max_tiles_jumbo > 2048:
                raise ValueError(
                    "max_tiles_jumbo > 2048 leaves < 20 gid bits in the "
                    "int32 gidk packing (2048 already bounds N to 2^20-1; "
                    "binning.bin_gaussians validates N against the split)"
                )
            if not self.jumbo_tier_spec:
                raise ValueError(
                    "max_tiles_jumbo needs a jumbo_tier_spec ladder, e.g. "
                    "((256, 8192), (512, 2048), (1024, 512))"
                )
            ks = [k for k, _ in self.jumbo_tier_spec]
            if ks != sorted(ks) or ks[-1] != self.max_tiles_jumbo:
                raise ValueError(
                    "jumbo_tier_spec k_hi values must ascend and end at "
                    f"max_tiles_jumbo ({self.max_tiles_jumbo}); got {ks}"
                )
        if self.quant_ranges is not None and (
            not isinstance(self.quant_ranges, tuple)
            or len(self.quant_ranges) != 4
        ):
            raise ValueError(
                "quant_ranges must be a (lox, sx, loy, sy) tuple"
            )
        if self.stream_format == "packed4" and self.slot_gather == "c64":
            raise ValueError(
                "slot_gather='c64' pairs exactly 5 packed rows; the "
                "4-row 'packed4' stream has nothing to pair (and c64 "
                "gathers measured 1.76x slower anyway)"
            )
        if self.stream_format in ("packed16", "packed4") and max(
            self.width, self.height
        ) > 8192:
            raise ValueError(
                "stream_format='packed16' quantizes means to u16 over "
                "1.1x the image extent; beyond 8192 px that is coarser "
                "than 1/8 px -- use stream_format='f32'"
            )
        if (
            self.impl == "pallas"
            and self.pixels_per_tile * self.pallas_block_size > 131072
        ):
            raise ValueError(
                "pixels_per_tile * pallas_block_size = "
                f"{self.pixels_per_tile * self.pallas_block_size} exceeds the "
                "backward blend kernel's ~16 MB VMEM budget (limit 131072, "
                "measured on v5e); lower pallas_block_size (128 fits "
                "tile_size 32)"
            )
