"""Typed configuration tree exposing every hard-coded constant of the reference.

The reference scatters ~40 numeric constants across function bodies (SURVEY.md §5
"Config / flag system"); here they live in one frozen dataclass tree so they are
CLI-overridable and jit-static.  Each field cites its origin.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """ORB-style detector parameters (frame.cpp:180; ORBextractor ctor)."""

    n_features: int = 2000  # frame.cpp:180
    scale_factor: float = 1.2  # frame.cpp:180
    n_levels: int = 6  # frame.cpp:180
    ini_fast_threshold: int = 12  # frame.cpp:180
    min_fast_threshold: int = 7  # frame.cpp:180
    cell_size: int = 30  # ORBextractor.cpp:784 (grid cell width ~30 px)
    edge_threshold: int = 19  # ORBextractor.h EDGE_THRESHOLD used for borders
    blur_ksize: int = 13  # GaussianBlur 13x13 (ORBextractor.cpp:1092)
    blur_sigma: float = 2.0  # ORBextractor.cpp:1092
    # "sift" = the reference's live path (128-d float); "orb" = the binary
    # steered-BRIEF path the reference ships as dead code (pluggable per
    # SURVEY §7 step 5); "geo_patch" = world-aligned NCC patches
    # (features/geopatch.py — beyond-reference, heading/side/flip-invariant by
    # construction; matched with desc_metric="ncc").  geo_patch descriptors are
    # attached by the pipeline (they need the frame's geo map) and recomputed
    # when re-matching with drift-compensated geo.
    descriptor: str = "sift"
    geopatch_half: int = 8  # patch half-extent in world grid cells
    geopatch_res: float = 0.5  # world grid resolution (m)
    # Descriptor window multiplier.  1.0 = reference parity: kp.size = 31 *
    # scale^level fed to SIFT (ORBextractor.cpp:847 + SiftDescriptorExtractor),
    # which yields ~+-93 px windows.  Values < 1 shrink the window toward the
    # texture correlation scale — measurably better descriptor separability on
    # speckle imagery (see tests/test_matching.py).
    desc_size_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Filter-mask parameters (frame.cpp:83-124)."""

    bright_factor: float = 2.5  # kill pixels > 2.5 * mean (frame.cpp:86,98)
    bright_radius: int = 6  # +-6 px box suppression (frame.cpp:86)
    center_width: int = 10  # +-10 cols around nadir (frame.cpp:86,105)
    side_pings: int = 150  # first/last pings removed (frame.cpp:86,108)
    side_cols_frac: float = 0.6  # side * 0.6 = 90 left/right cols (frame.cpp:111)


@dataclasses.dataclass(frozen=True)
class NormalizeConfig:
    """Image normalization (frame.cpp:57-81)."""

    mean_factor: float = 2.5  # max_used = mean * 2.5 (frame.cpp:59-63)


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Robust matcher parameters (FEAmatcher.cpp)."""

    # "kp" = reference-parity keypoint-to-keypoint search (geosearch.py);
    # "dense" = dense world-correlation search (dense.py, beyond-reference)
    mode: str = "kp"
    dense: "DenseMatchConfig" = dataclasses.field(
        default_factory=lambda: DenseMatchConfig()
    )
    geo_radius: float = 8.0  # geo search radius in meters (FEAmatcher.cpp:67)
    sift_dist_bound: float = 350.0  # L2 descriptor bound (FEAmatcher.cpp:108)
    ratio_test: float = 0.35  # first/second NN ratio (FEAmatcher.cpp:110)
    # "l2" (SIFT) | "hamming" (ORB binary path) | "ncc" (geo-patch descriptors:
    # distance = 1 - normalized cross-correlation, one MXU matmul)
    desc_metric: str = "l2"
    ncc_min: float = 0.35  # minimum NCC to accept (ncc metric only)
    ncc_ratio: float = 1.0  # first/second ratio on (1 - ncc); 1.0 disables
    orb_dist_bound: float = 88.0  # Hamming bound (FEAmatcher.cpp:143)
    orb_dist_bound_cross: float = 80.0  # opposite-parity bound (FEAmatcher.cpp:145)
    scc_max_iters: int = 1000  # RANSAC hypotheses (FEAmatcher.cpp:189)
    scc_samples: int = 2  # samples per hypothesis (FEAmatcher.cpp:189)
    scc_pix_error: float = 2.5  # inlier tolerance in pings (FEAmatcher.cpp:190)
    # "x" = the reference's shipped single-axis check; "xy" = the two-axis
    # variant it sketches as disabled code (FEAmatcher.cpp:250-317: 3 samples,
    # tolerances 2.5 / 15.0) — required for crossing-line pairs where the
    # along-track offset model does not apply
    scc_mode: str = "x"
    scc_pix_error_y: float = 15.0  # FEAmatcher.cpp:255
    consistency_thres: float = 2.5  # cross-direction model gap (FEAmatcher.cpp:329)
    rng_seed: int = 1  # cv::setRNGSeed(1) (FEAmatcher.cpp:60)
    # The reference's commented-out mutual cross-check (FEAmatcher.cpp:407-422):
    # keep only matches where each keypoint is the other's nearest neighbor.
    # Strong precision boost for the automatic (detected) path.
    cross_check: bool = False
    # Improvement over the reference (off by default for parity): when > 0, the
    # ratio test's second-best candidate must lie at least this many meters from
    # the best one.  On texture-correlated imagery the plain ratio test is
    # defeated by near-duplicate neighbors of the true match; excluding the
    # best's spatial neighborhood restores its discriminative meaning.
    ratio_excl_radius: float = 0.0
    # Multi-chip: NN searches route through the ring-pass kernel
    # (parallel/ring.py, reference blocks rotated with ppermute) when a
    # pipeline mesh is configured AND the keypoint capacity is at least this
    # — below it the (K, K) block fits one chip and the ring's n-step
    # ppermute latency only costs.  With a mesh set, capacities >= this also
    # bypass the STACKED whole-survey dispatch (its (pairs, K, K) distance
    # tensor is exactly what the ring shards).  4096 is the measured
    # crossover (8-device mesh, 128-d descriptors, scripts/ring_crossover.py
    # + PERF.md round 4): ring loses at K=2048 (1.26x slower — collective
    # overhead), wins 1.64x at K=4096 and 2.04x at K=8192.  CAVEAT: the
    # ring side of that table ran on the 8-device VIRTUAL CPU mesh (one
    # physical TPU chip in this environment) — the crossover on real ICI is
    # an extrapolation and should be re-measured on multi-chip hardware.
    ring_min_kps: int = 4096


@dataclasses.dataclass(frozen=True)
class DenseMatchConfig:
    """Dense world-correlation matcher (matching/dense.py) — beyond-reference.

    Replaces keypoint-to-keypoint descriptor matching with a sliding NCC search
    of each source geo-patch over the target frame's world raster: yield no
    longer depends on cross-pass detector repeatability (the measured
    bottleneck on speckle imagery).  Select with ``MatcherConfig.mode="dense"``.
    """

    search_radius: float = 10.0  # candidate offsets within this many meters
    step_cells: int = 2  # candidate stride in raster cells
    ncc_min: float = 0.35  # minimum correlation to accept
    ncc_ratio: float = 1.0  # (1-best) <= ratio * (1-second); 1.0 disables
    min_cover: float = 0.6  # fraction of patch cells with raster data
    # local displacement-field consistency filter (replaces the global
    # along-track-offset SCC, which under-fits drift that varies along a line)
    smooth_radius: float = 20.0  # neighborhood radius (m)
    smooth_min_neighbors: int = 2
    smooth_tol: float = 1.5  # max deviation from the local median (m)
    # defaults measured on drifting synthetic surveys: 420/424 correct matches
    # at ncc_min=0.35/tol=1.5/min_neighbors=2 (vs 70 at 0.45/1.0/3)


@dataclasses.dataclass(frozen=True)
class KeypointNoiseConfig:
    """Sonar measurement noise (optimizer.cpp:685)."""

    sigma_r: float = 0.1  # range sigma (m)
    alpha_bw_deg: float = 0.1  # beam-width angular sigma (deg), scaled by range


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    """Per-correspondence mini-graph solve (optimizer.cpp:641-982)."""

    nadir_threshold: int = 20  # discard kps near nadir (optimizer.cpp:602)
    compass_flip_yaw: float = 2.0 * math.pi / 3.0  # optimizer.cpp:700-703
    prior_sigma: float = 1e-6  # source-pose prior (optimizer.cpp:773)
    odo_sigma_ro_deg: float = 0.1  # optimizer.cpp:778
    odo_sigma_pi_deg: float = 0.1
    odo_sigma_ya_deg: float = 0.5
    odo_x_scale: float = 2.0  # x sigma = 2 * |dx|
    odo_y_scale: float = 0.1  # y sigma = |dy| / 10
    odo_sigma_z: float = 0.1
    quality_threshold: float = 2.0  # accept if ini/fnl dist ratio > 2 (opt.cpp:884,896)
    max_lm_iters: int = 40
    tria_xy_sigma: float = 10.0  # point-prior xy sigma (optimizer.cpp:1006)
    tria_z_baseline_div: float = 100.0  # z sigma = baseline / 100 (optimizer.cpp:1005)


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    """Global trajectory optimization (optimizer.cpp:21-317)."""

    # odometry noise (optimizer.cpp:24-28): wgt1_=0.001, wgt_2=10
    odo_sigma_ro_deg: float = 0.001
    odo_sigma_pi_deg: float = 0.001
    odo_sigma_ya_deg: float = 0.001 * 10 * 0.1  # ya1_ = 0.1*wgt1_*wgt_2 deg
    odo_sigma_x: float = 0.01  # wgt1_*wgt_2
    odo_sigma_y: float = 0.01
    odo_sigma_z: float = 0.001
    prior_sigma: float = 1e-6  # first-ping prior (optimizer.cpp:166)
    init_noise_xyz: float = 0.5  # injected initial-value noise (optimizer.cpp:24,32)
    init_noise_rpy_deg: float = 0.5
    use_anno: bool = True  # USE_ANNO (optimizer.cpp:26)
    add_loop_closures: bool = True  # ADD_LC (optimizer.cpp:26)
    max_gn_iters: int = 30  # outer LM iterations of the batch solver
    cg_tol: float = 1e-6
    cg_max_iters: int = 250
    # Linear-solve strategy per LM trial:
    # * "direct" — NOT a preconditioner: the EXACT damped step by multi-RHS
    #   chain factorization (cyclic reduction / Thomas by backend) + Woodbury
    #   over the loop-closure columns — zero CG iterations (pose_graph.py:
    #   _direct_lm_step).  Replaces the serial PCG dependency chain with
    #   log2(P) levels of batched MXU algebra; cost grows with the LC count
    #   (one (6L, 6L) dense Cholesky per trial).
    # * "jacobi" = block-diagonal PCG; "tridiag" = segment-parallel cyclic-
    #   reduction-preconditioned PCG (best PCG on CPU); "dense_seg" = the SAME
    #   segmented chain preconditioner in MXU form — dense per-segment
    #   inverses built once per LM trial, each PCG application one wide
    #   batched GEMM.
    # * "auto" picks by backend (PERF.md round-3 shootout): on TPU, "direct"
    #   (falling back to "dense_seg" above ~1k LC factors, where the Woodbury
    #   buffers outgrow their win); "tridiag" elsewhere.
    preconditioner: str = "auto"
    # Damping sweep for the "direct" path: each LM trial solves the exact
    # step for EVERY lam*factor candidate in one K-wide batched factorization
    # (vmapped cyclic reduction) and keeps the best improving one — a
    # parallel line search in the damping dimension.  (1.0,) reproduces the
    # classic single-lam accept(*0.3)/reject(*10) schedule and is the
    # DEFAULT: measured on TPU v5e at the 12k bench point the K-wide vmapped
    # CR is NOT free (K=4: 2.2 s vs 0.87 s single; K=6: 29 s — the vmapped
    # recursion multiplies HBM traffic on the (K, P, 6, R) buffers) and the
    # sweep does not reduce the trial count (every trial already improves
    # the error by > the stall tolerance, so LM runs to max_gn_iters either
    # way; final error differs by 0.3%).  Kept as an opt-in for
    # small-P / damping-sensitive problems.  Single-device direct path only:
    # the sequence-parallel direct step (parallel/seq.py) always runs the
    # classic single-lam schedule.
    lam_sweep_factors: tuple = (1.0,)
    # Coarse-to-fine initialization: > 1 solves the graph restricted to every
    # stride-th pose first (composed odometry between anchors, LC measurements
    # conjugated to anchors, sqrt(stride)-inflated odo sigmas), prolongates
    # the coarse estimate along the clean DR chain and starts the fine LM
    # from there — adopted only if it measurably lowers the initial error;
    # 0/1 = off.  Fresh batch solves only (resumed / warm-started callers
    # skip it via allow_coarse_init=False).
    coarse_init_stride: int = 0
    tridiag_segment: int = 256  # segment length for the segment-parallel solve
    seed: int = 0  # initial-noise PRNG seed
    # Compute EXACT per-pose marginal covariances of the GLOBAL two-stage
    # solve (pose_graph.pg_pose_marginals: Takahashi selected inversion +
    # Woodbury over the LC columns) — beyond the reference, which only ever
    # computes marginals of the per-correspondence MINI-graphs
    # (optimizer.cpp:956).  Same wiring as FullBAConfig.marginals:
    # SlamResult.pose_sigmas, est_pose_sigmas_all.txt, CLI --metrics.
    marginals: bool = False


@dataclasses.dataclass(frozen=True)
class FullBAConfig:
    """Joint pose+landmark bundle adjustment (solvers/full_ba.py) — the
    beyond-reference estimation mode (BASELINE north star: Schur-complement BA
    core).  Landmark priors are the flat-floor depth regularization; xy is
    nearly free."""

    lm_prior_xy_sigma: float = 50.0
    lm_prior_z_sigma: float = 1.5
    # Correspondences whose two DR geo projections disagree by more than this
    # (meters) are dropped at problem build.  A TRUE match's disagreement is
    # bounded by the inter-line DR drift; wrong matches spread up to the
    # matcher's 8 m search radius.  Set it to your mission's drift budget when
    # feeding DETECTED matches (the CLI --detected path uses 4.0); keep 0 (off)
    # for annotations or when drift may exceed any fixed bound — with the gate
    # on and all matches rejected the solve degrades gracefully to DR.
    max_geo_discrepancy: float = 0.0
    # Huber robust loss on the whitened sonar residual norm (0 disables).
    # Essential for detected correspondences (no quality gate filters them in
    # this estimator); near no-op for clean annotation data where whitened
    # inlier residuals are O(1).
    huber_delta: float = 3.0
    max_iters: int = 40
    cg_tol: float = 1e-6
    cg_max_iters: int = 250
    # Linear-solve strategy per LM trial (see PoseGraphConfig.preconditioner
    # for the family):
    # * "direct" — the EXACT damped step of the Schur-reduced pose system:
    #   multi-RHS chain factorization + Woodbury over the landmark coupling
    #   columns (3 per correspondence), zero CG iterations
    #   (full_ba.py:_direct_ba_step).
    # * "chain" — EXACT chain-preconditioned PCG (round 5): the Schur-
    #   corrected chain approximation is factored once per LM trial into the
    #   two-level ChainFactor (tridiag.chain_factor — dense segment inverses
    #   + spike boundary system); each PCG application is batched GEMM work
    #   and solves the chain EXACTLY.  Measured honestly (PERF round 5): CG
    #   counts are NOT materially lower than dense_seg's for full BA — the
    #   Schur spectrum is landmark-coupling-bound, not chain-bound — so this
    #   stays OPT-IN (wins 1.16x at K=4k, loses ~10% at 8k/32k).
    # * "jacobi" | "tridiag" | "dense_seg" — approximate PCG preconditioners.
    # * "auto": on TPU, "direct" up to 2048 (padded) correspondences, then
    #   "dense_seg" — the measured crossover (scripts/ab_chain_ba.py: direct
    #   0.99 s at K=2048 vs 7.0 s at 4096 where the (3K)^3 capacitance
    #   Cholesky takes over); "tridiag" elsewhere.
    preconditioner: str = "auto"
    tridiag_segment: int = 256
    # Compute EXACT per-pose marginal covariances at the solution
    # (full_ba.ba_pose_marginals: Takahashi selected inversion on the chain
    # + the low-rank Woodbury correction — the reference's GTSAM QR
    # Marginals analogue, optimizer.cpp:956).  One post-solve computation;
    # results ride SlamResult.pose_sigmas, the CLI --metrics JSON, and the
    # est_pose_sigmas_all.txt dump.  The CLI enables it automatically when
    # --metrics is requested with the full_ba estimator.
    marginals: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    min_overlap: float = 0.4  # pair gate (diasss2.cpp:28)
    # "two_stage" = reference-parity estimation (per-correspondence LC solves +
    # pose graph, optimizer.cpp:641-982 + :21-317); "full_ba" = joint
    # pose+landmark bundle adjustment with Schur elimination (solvers/full_ba.py)
    # — uses every nadir-passing correspondence, recovers cross-track drift from
    # crossing lines, measured ~4x lower ATE on tie-line surveys
    estimator: str = "two_stage"
    detector: DetectorConfig = dataclasses.field(default_factory=DetectorConfig)
    mask: MaskConfig = dataclasses.field(default_factory=MaskConfig)
    normalize: NormalizeConfig = dataclasses.field(default_factory=NormalizeConfig)
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    kp_noise: KeypointNoiseConfig = dataclasses.field(default_factory=KeypointNoiseConfig)
    loop_closure: LoopClosureConfig = dataclasses.field(default_factory=LoopClosureConfig)
    pose_graph: PoseGraphConfig = dataclasses.field(default_factory=PoseGraphConfig)
    full_ba: FullBAConfig = dataclasses.field(default_factory=FullBAConfig)
    # Drift-compensated re-matching (detected path only; beyond-reference).
    # After each solve, every frame's geo image is recomputed from the ESTIMATED
    # poses and matching re-runs with the re-centered (and tighter) geo gate —
    # recovering correspondences the DR drift pushed outside the search radius,
    # then re-solving warm-started.  Measured to monotonically improve ATE and
    # match precision on drifting synthetic surveys (NOTES_ROUND1.md).
    rematch_iters: int = 0
    rematch_geo_radius: float = 3.0  # tighter gate once drift is compensated
    rematch_geo_discrepancy: float = 2.0  # full-BA gate on re-iterations
    # Adaptive re-match search extent (round 5): after each solve, measure
    # the 95th-percentile residual geo discrepancy of the current matches at
    # the drift-compensated geo and shrink the next round's search radius to
    # ``q95 * rematch_margin + 2 * geopatch_res`` (bucketed so shapes stay
    # stable, capped at rematch_geo_radius; pipeline._rematch_plan).  The
    # dense matcher's score/window tensors shrink quadratically with the
    # extent — measured at the auto bench point the rounds >= 2 ran at the
    # full radius while the residual was sub-meter.  Re-matching also STOPS
    # early when a solve moves every pose by < half a raster cell (the
    # recomputed geo, and therefore the matches, cannot change).
    rematch_adaptive: bool = True
    rematch_margin: float = 1.5
    # Stop re-matching when the measured post-solve residual q95 falls to
    # this many raster cells: both match endpoints are cell centers, so a
    # CONVERGED estimate still shows ~2 cells of apparent discrepancy —
    # below it further rounds chase quantization noise (measured at the auto
    # bench point: the at-floor round cost ~2 s and moved ATE 0.494 -> 0.563,
    # i.e. slightly HURT; pipeline._rematch_plan docstring).
    rematch_stop_resid_cells: float = 2.0
    # Multi-chip execution: when set (and that many devices exist), the global
    # solves run sequence-parallel over an n-device mesh (parallel/seq.py:
    # pose chain block-partitioned, O(P/n)+halo per device).  None = one chip.
    mesh_devices: int | None = None


DEFAULT = PipelineConfig()


def pair_mode_config() -> PipelineConfig:
    """The pairwise-variant constants of ``Optimizer::TrajOptimizationPair``
    (optimizer.cpp:321-334): USE_ANNO=0, looser odometry noise
    (0.01deg/0.05deg, 0.05 m xy, 0.01 m z) and 5 m / 5 deg injected initial
    noise."""
    return PipelineConfig(
        pose_graph=PoseGraphConfig(
            odo_sigma_ro_deg=0.01,
            odo_sigma_pi_deg=0.01,
            odo_sigma_ya_deg=0.05,
            odo_sigma_x=0.05,
            odo_sigma_y=0.05,
            odo_sigma_z=0.01,
            init_noise_xyz=5.0,
            init_noise_rpy_deg=5.0,
            use_anno=False,
        )
    )


def automatic_config(drift_budget: float = 4.0) -> PipelineConfig:
    """Fully-automatic SLAM profile: ZERO annotations, tuned for cross-pass
    matching on real sonar physics.

    Combines the beyond-reference pieces that make the automatic path actually
    improve the trajectory (each measured individually, NOTES_ROUND1.md):
    world-aligned geo-patch descriptors + NCC matching (heading/side/flip
    invariant), mutual cross-check, two-axis SCC (crossing lines), joint
    full-BA estimation with the DR geo-discrepancy gate, and drift-compensated
    re-matching.

    ``drift_budget``: largest credible DR drift between overlapping lines (m)
    — sets the first-pass geo-discrepancy gate AND (via the search radius)
    how far the dense matcher looks.  SET IT TO THE MISSION: measured on an
    18+2-line, 8000-ping survey whose accumulated drift (ATE_DR 12.9 m) was
    3x the default budget, the default-config automatic run DEGRADED the
    trajectory (13.6 m — the gate rejects true matches and aliased
    survivors mislead the solve) while drift_budget=8 improved it to
    10.8 m; the same survey solves to 6.4 m from annotations (the estimator
    scales — the budget is a matching constraint, PERF.md round 5).  An
    out-of-budget mission is observable at runtime: the
    ``rematch_saturated_rounds`` counter fires when the measured residual
    wants more search extent than the budget allows.
    """
    return PipelineConfig(
        min_overlap=0.1,  # admit tie-line crossings (main-vs-tie IoU ~0.2)
        estimator="full_ba",
        detector=DetectorConfig(descriptor="geo_patch"),
        matcher=MatcherConfig(
            mode="dense",
            dense=DenseMatchConfig(search_radius=max(10.0, 1.5 * drift_budget)),
            # kp-mode fields kept sane in case the caller flips mode back
            desc_metric="ncc",
            geo_radius=10.0,
            cross_check=True,
            scc_mode="xy",
        ),
        pose_graph=PoseGraphConfig(use_anno=False),
        full_ba=FullBAConfig(max_geo_discrepancy=drift_budget),
        rematch_iters=2,
        rematch_geo_radius=6.0,
        rematch_geo_discrepancy=4.0,
    )
