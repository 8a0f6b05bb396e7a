"""On-TPU parity check: Mosaic-compiled pallas_fill vs interpreter mode.

Interpreter mode is property-tested against the golden model on CPU
(tests/test_pallas_kernel.py); this script closes the remaining gap by
checking the Mosaic lowering produces bit-identical traceback bytes and
corner scores on the real chip. Run it in the single TPU process:

    timeout 580 python tools/check_pallas_tpu.py
"""

import numpy as np


def main():
    from clique_tpu.align.batch import scoring_to_params
    from clique_tpu.align.pallas_kernel import pallas_fill
    from clique_tpu.align.scoring import AffineScoring

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    failures = 0
    for trial, (B, LR, LD, n1, n2) in enumerate([
            (8, 127, 130, 128, 256),
            (16, 380, 500, 384, 512),
            (32, 511, 639, 512, 640),
    ]):
        refs = np.zeros((B, n1), dtype=np.uint8)
        refs[:, 1:LR + 1] = rng.choice(bases, (B, LR))
        reads = np.zeros((B, n2 - 1), dtype=np.uint8)
        reads[:, :LD] = rng.choice(bases, (B, LD))
        # sprinkle N / special bytes to exercise the special-score rule
        mask = rng.random((B, LD)) < 0.02
        reads[:, :LD][mask] = ord("N")
        params = scoring_to_params(AffineScoring.aligner_default())

        tb_t, c_t = pallas_fill(refs, reads, LR, LD, params, n1=n1, n2=n2)
        tb_i, c_i = pallas_fill(refs, reads, LR, LD, params, n1=n1, n2=n2,
                                interpret=True)
        tb_t, c_t = np.asarray(tb_t), np.asarray(c_t)
        tb_i, c_i = np.asarray(tb_i), np.asarray(c_i)
        tb_ok = np.array_equal(tb_t, tb_i)
        c_ok = np.array_equal(c_t, c_i)
        print(f"trial {trial} B={B} {LR}x{LD}: tb {'OK' if tb_ok else 'MISMATCH'}"
              f"  corner {'OK' if c_ok else 'MISMATCH'}")
        if not tb_ok:
            bad = np.argwhere(tb_t != tb_i)
            print(f"  first diffs: {bad[:5].tolist()}")
            failures += 1
        if not c_ok:
            print(f"  corner tpu   {c_t[:4]}")
            print(f"  corner interp{c_i[:4]}")
            failures += 1
    print("PARITY PASS" if failures == 0 else f"PARITY FAIL ({failures})")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
