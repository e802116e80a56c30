package graft.simd;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD distance kernels over the JDK Vector API (jdk.incubator.vector) —
 * the Spark-side analog of the reference's AVX-512 distance dispatch
 * (include/svs/core/distance/euclidean.h:216-328,
 * include/svs/core/distance/inner_product.h:185-299: unrolled
 * register-blocked fma loops selected per-arch at runtime).
 *
 * Lane-wise accumulate + one final reduce means the fold order differs from
 * the sequential scalar kernel, so results can differ from the scalar path
 * in the last ulp. These kernels are therefore an OPT-IN fast path: the
 * oracle-certified query paths keep the scalar fold (bit-identical to the
 * DuckDB oracle), and SimdSpec pins SIMD-vs-scalar agreement to a relative
 * tolerance plus full top-k agreement on the test corpus — the same
 * tolerance-not-bit-exactness contract the reference applies to its own
 * SIMD kernels (tests pin recall +/- epsilon, not exact distances).
 *
 * This class touches jdk.incubator.vector at class-load time; callers must
 * go through {@link graft.core.Simd} which probes availability and falls
 * back to the scalar kernels when the JVM was started without
 * --add-modules jdk.incubator.vector.
 */
public final class SimdKernels {
    // Typed Object, not VectorSpecies: sbt/zinc's API extraction loads this
    // class reflectively in the build JVM (no --add-modules there), and any
    // incubator type in a declared field/method signature triggers an
    // IllegalAccessError at class-load. Method BODIES are never inspected by
    // reflection, so the species lives behind an Object field and each
    // kernel casts it locally.
    private static final Object SPECIES = DoubleVector.SPECIES_PREFERRED;

    private SimdKernels() {}

    /** Lane count of the preferred species (8 on AVX-512, 4 on AVX2). */
    public static int lanes() {
        @SuppressWarnings("unchecked")
        final VectorSpecies<Double> S = (VectorSpecies<Double>) SPECIES;
        return S.length();
    }

    /** Squared L2 distance, lane-accumulated then reduced. */
    public static double l2(double[] a, double[] b) {
        @SuppressWarnings("unchecked")
        final VectorSpecies<Double> S = (VectorSpecies<Double>) SPECIES;
        int n = a.length;
        int bound = S.loopBound(n);
        DoubleVector acc = DoubleVector.zero(S);
        int i = 0;
        for (; i < bound; i += S.length()) {
            DoubleVector va = DoubleVector.fromArray(S, a, i);
            DoubleVector vb = DoubleVector.fromArray(S, b, i);
            DoubleVector d = va.sub(vb);
            acc = d.fma(d, acc);
        }
        double s = acc.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            double d = a[i] - b[i];
            s += d * d;
        }
        return s;
    }

    /** Inner product, lane-accumulated then reduced. */
    public static double ip(double[] a, double[] b) {
        @SuppressWarnings("unchecked")
        final VectorSpecies<Double> S = (VectorSpecies<Double>) SPECIES;
        int n = a.length;
        int bound = S.loopBound(n);
        DoubleVector acc = DoubleVector.zero(S);
        int i = 0;
        for (; i < bound; i += S.length()) {
            DoubleVector va = DoubleVector.fromArray(S, a, i);
            DoubleVector vb = DoubleVector.fromArray(S, b, i);
            acc = va.fma(vb, acc);
        }
        double s = acc.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            s += a[i] * b[i];
        }
        return s;
    }

    /**
     * Cosine similarity: dot, |a|^2 and |b|^2 in one fused pass (three
     * lane accumulators), mirroring the scalar kernel's single-loop shape.
     * Returns 0 when either norm is zero (scalar-kernel convention).
     */
    public static double cosine(double[] a, double[] b) {
        @SuppressWarnings("unchecked")
        final VectorSpecies<Double> S = (VectorSpecies<Double>) SPECIES;
        int n = a.length;
        int bound = S.loopBound(n);
        DoubleVector dot = DoubleVector.zero(S);
        DoubleVector na = DoubleVector.zero(S);
        DoubleVector nb = DoubleVector.zero(S);
        int i = 0;
        for (; i < bound; i += S.length()) {
            DoubleVector va = DoubleVector.fromArray(S, a, i);
            DoubleVector vb = DoubleVector.fromArray(S, b, i);
            dot = va.fma(vb, dot);
            na = va.fma(va, na);
            nb = vb.fma(vb, nb);
        }
        double sd = dot.reduceLanes(VectorOperators.ADD);
        double sa = na.reduceLanes(VectorOperators.ADD);
        double sb = nb.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            double x = a[i];
            double y = b[i];
            sd += x * y;
            sa += x * x;
            sb += y * y;
        }
        if (sa == 0.0 || sb == 0.0) {
            return 0.0;
        }
        return sd / (Math.sqrt(sa) * Math.sqrt(sb));
    }
}
