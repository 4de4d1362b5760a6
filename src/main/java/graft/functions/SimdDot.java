package graft.functions;

import jdk.incubator.vector.DoubleVector;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD lane-per-pair dot kernel for the tile near-dup scorer
 * (jdk.incubator.vector; JDK 17+ with {@code --add-modules
 * jdk.incubator.vector} — build.sbt adds it to every forked JVM; on a
 * cluster, add it to executor JVM options or the caller falls back to the
 * scalar kernel via {@link #lanes()} probing).
 *
 * Bit-exactness contract: each LANE is one (a-row, b-row) pair and
 * accumulates its dot product over t = 0..dim-1 in index order with a
 * separate IEEE multiply then add ({@code acc.add(bv.mul(av))}, never FMA,
 * which would skip the intermediate rounding) — so every lane's result is
 * bit-identical to the scalar loop {@code d += a[t] * b[t]}. SIMD here
 * changes WHICH pairs are computed together, never the arithmetic within
 * a pair.
 *
 * Layout: the caller packs B-rows interleaved by chunk —
 * {@code bT[chunkBase + t*L + lane] = b_(j0+lane)[t]} with L = lanes() —
 * so the t-loop issues one contiguous vector load per step (streaming,
 * prefetch-friendly) instead of an L-way gather.
 */
public final class SimdDot {
  private static final VectorSpecies<Double> S = DoubleVector.SPECIES_PREFERRED;

  private SimdDot() {}

  /** Lane count of the preferred species (8 on AVX-512, 4 on AVX2). */
  public static int lanes() {
    return S.length();
  }

  /**
   * Dots of {@code aRow[0..dim)} against the L b-rows packed at
   * {@code bT[base..base + dim*L)}, written to {@code out[0..L)}.
   */
  public static void dotChunk(double[] aRow, int dim, double[] bT, int base, double[] out) {
    DoubleVector acc = DoubleVector.zero(S);
    final int L = S.length();
    int off = base;
    for (int t = 0; t < dim; t++, off += L) {
      DoubleVector bv = DoubleVector.fromArray(S, bT, off);
      acc = acc.add(bv.mul(DoubleVector.broadcast(S, aRow[t])));
    }
    acc.intoArray(out, 0);
  }

  /**
   * Four adjacent chunks (4·L pairs) in one pass — four independent vector
   * accumulators hide the add-chain latency that binds the single-chunk
   * form (one acc vector = one ~4-cycle-latency chain per t step). Same
   * per-lane arithmetic as dotChunk: mul then add, t in order.
   */
  public static void dotChunk4(double[] aRow, int dim, double[] bT, int base, double[] out) {
    final int L = S.length();
    final int stride = dim * L;
    DoubleVector a0 = DoubleVector.zero(S), a1 = DoubleVector.zero(S),
        a2 = DoubleVector.zero(S), a3 = DoubleVector.zero(S);
    int off = base;
    for (int t = 0; t < dim; t++, off += L) {
      DoubleVector av = DoubleVector.broadcast(S, aRow[t]);
      a0 = a0.add(DoubleVector.fromArray(S, bT, off).mul(av));
      a1 = a1.add(DoubleVector.fromArray(S, bT, off + stride).mul(av));
      a2 = a2.add(DoubleVector.fromArray(S, bT, off + 2 * stride).mul(av));
      a3 = a3.add(DoubleVector.fromArray(S, bT, off + 3 * stride).mul(av));
    }
    a0.intoArray(out, 0);
    a1.intoArray(out, L);
    a2.intoArray(out, 2 * L);
    a3.intoArray(out, 3 * L);
  }
}
