package graft.core

/** Runtime probe for the JDK Vector API (jdk.incubator.vector).
  *
  * `graft.simd.SimdKernels` references incubator classes at class-load time,
  * so a JVM started without `--add-modules jdk.incubator.vector` throws
  * `NoClassDefFoundError` on first touch. This probe runs the load once,
  * executes a tiny kernel to force linkage, and caches the answer —
  * `Metric.simd` falls back to the scalar kernels when the module is absent,
  * so no caller ever has to know about JVM flags. The shape mirrors the
  * reference's runtime micro-arch dispatch (include/svs/lib/arch.h:36-118:
  * probe CPUID once, pick the widest available kernel, fall back to the
  * generic one).
  */
object SimdSupport {

  /** True iff the Vector API module is loadable in this JVM. */
  lazy val available: Boolean =
    try {
      val a = Array(1.0, 2.0, 3.0)
      graft.simd.SimdKernels.l2(a, a) == 0.0 &&
        graft.simd.SimdKernels.lanes() >= 1
    } catch {
      case _: LinkageError => false // NoClassDefFoundError and friends
    }

  /** Preferred-species double lane count (8 on AVX-512), 0 if unavailable. */
  def lanes: Int = if (available) graft.simd.SimdKernels.lanes() else 0
}
