package graft

/** The BANDS.json read-order rules as EXECUTABLE classification
  * (VERDICT r17 #1): `graft.Bench` loads the checked-in bands at
  * drive end and prints a `"band_verdict"` on the one JSON line the
  * driver parses, so a contended artifact (BENCH_r17's 267 s — +42%
  * like-for-like on a diff that changed zero query-path lines)
  * carries its own adjudication instead of requiring a human to walk
  * BANDS.json. The classifier is pure over a [[Reading]] so
  * BenchGuardSpec can replay every recorded ledger drive through it
  * and assert each reproduces its adjudicated verdict class.
  *
  * Verdict vocabulary (one of):
  *   - `quiet` — kernels in the matched profile's band, par ratios
  *     inside the quiet core (a LONE elevated endpoint with a quiet
  *     total is an endpoint transient, not a verdict), rep stats in
  *     band, total inside the profile+catalog era's quiet cluster.
  *   - `off-profile` — the host-cal kernels match NO recorded
  *     profile, fully or partially: totals are not comparable to any
  *     recorded cluster (the r16 lesson — a new host profile, not a
  *     regression). A single endpoint ABOVE an otherwise-matching
  *     band is endpoint contention, not a profile shift (r18 drive 2:
  *     pre kernel 1.503 with post 1.037 in-band B), and classifies
  *     through the contention rules instead.
  *   - `steady-contention` — both par-ratio endpoints above the quiet
  *     core (r16 drive 4), or rep_spread med at/above the contention
  *     band, or — once per-profile headline medians are recorded —
  *     a broad n_inflated sweep (the uniform whole-drive inflation
  *     the endpoint kernels only catch at the endpoints).
  *   - `contended-start` — exactly one par endpoint elevated WITH an
  *     elevated total (r17 drive 2: pre ratio 2.09, total +5%).
  *   - `mid-drive-transient` — kernels and ratios quiet but rep1_infl
  *     med above its quiet band, or an elevated total that no
  *     recorded field explains (the class both kernels miss;
  *     BENCH_r16's shipped artifact, r15 drive 5).
  *   - `tail-contention` (VERDICT r18 #2) — every headline field
  *     quiet but the single-shot tail (`tail_s` = total minus the
  *     headline-35 sum) above its recorded quiet band: load that
  *     median-of-3 shields the headliners from lands whole on the
  *     180 single-shot queries (r18 drives 8–10, r19 drives 1–2 —
  *     previously caught only by the unexplained-total fallback).
  *
  * Maintenance: bands EVOLVE (BANDS.json's append-per-round
  * contract); the classifier reads whatever the file says, so a band
  * widening needs no code change here.
  */
object Bands {
  /** One host profile's bands. `eraClusters` keys quiet-total ranges
    * by CATALOG SIZE — totals are only comparable within one catalog
    * era (BANDS.json profile notes); a catalog size with no recorded
    * era yields no total evidence either way.
    */
  final case class Profile(name: String, calLo: Double, calHi: Double,
      eraClusters: Map[Int, (Double, Double)],
      headlineQuietMedians: Map[String, Double],
      tailQuiet: Option[(Double, Double)] = None)

  final case class BandSet(profiles: Seq[Profile], parRatioQuietHi: Double,
      repSpreadContentionMed: Double, rep1MedQuietHi: Double,
      nInflatedContentionMin: Int)

  /** One drive's calibration evidence. Endpoint fields are positional
    * (pre, post); `None` = honestly unrecorded (pre-r15 ledger rows),
    * which contributes NO evidence rather than quiet evidence.
    */
  final case class Reading(
      hostCal: Seq[Option[Double]],
      parKernel: Seq[Option[Double]],
      parRatio: Seq[Option[Double]],
      repSpreadMed: Option[Double],
      rep1Med: Option[Double],
      total: Double,
      catalog: Int,
      profileHint: Option[String] = None,
      nInflated: Option[Int] = None,
      tailS: Option[Double] = None)

  /** [[loadResult]] outcome: a present-but-corrupt band file must be
    * distinguishable from an absent one (ADVICE r18 — NonFatal-to-None
    * mapped both to a silent `"no-bands"`, so a bad edit to the
    * checked-in file would quietly degrade live adjudication until
    * someone ran BenchGuardSpec). `Missing` is the legitimate
    * bands-not-shipped case; `Unreadable` is a broken artifact and
    * prints its own verdict literal plus one stderr warning at the
    * bench call site.
    */
  sealed trait LoadResult
  final case class Loaded(bands: BandSet) extends LoadResult
  case object Missing extends LoadResult
  final case class Unreadable(detail: String) extends LoadResult

  /** Parse BANDS.json. Never throws: a missing file is `Missing`
    * (bench prints `"no-bands"`), a present-but-malformed one is
    * `Unreadable` (bench prints `"bands-unreadable"`) — either way the
    * drive is still a valid measurement, just not self-adjudicating.
    * Structural sanity of the file itself is BenchGuardSpec's job.
    */
  def loadResult(path: String = "BANDS.json"): LoadResult = {
    if (!new java.io.File(path).isFile) return Missing
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val src = scala.io.Source.fromFile(path, "UTF-8")
      val root = try JsonMethods.parse(src.mkString) finally src.close()
      def d(v: JValue): Double = v.values.toString.toDouble
      def pair(v: JValue): (Double, Double) = v match {
        case JArray(List(a, b)) => (d(a), d(b))
        case other => throw new IllegalArgumentException(s"not a 2-array: $other")
      }
      val profiles = (root \ "profiles").asInstanceOf[JObject].obj.map {
        case (name, p) =>
          val (lo, hi) = pair(p \ "host_cal_s")
          val eras = (p \ "era_quiet_total_s") match {
            case JObject(fields) => fields.map { case (k, v) => k.toInt -> pair(v) }.toMap
            case _ => Map.empty[Int, (Double, Double)]
          }
          val medians = (p \ "headline_quiet_median_s") match {
            case JObject(fields) => fields.map { case (k, v) => k -> d(v) }.toMap
            case _ => Map.empty[String, Double]
          }
          val tailBand = (p \ "tail_quiet_s") match {
            case JArray(List(a, b)) => Some((d(a), d(b)))
            case _ => None // tail band not yet recorded for this profile
          }
          Profile(name, lo, hi, eras, medians, tailBand)
      }
      val x = root \ "cross_profile"
      Loaded(BandSet(
        profiles = profiles,
        parRatioQuietHi = pair(x \ "par_ratio_quiet_core")._2,
        repSpreadContentionMed = d(x \ "rep_spread_contention_med_gte"),
        rep1MedQuietHi = pair(x \ "rep1_infl_quiet_med")._2,
        nInflatedContentionMin = (x \ "n_inflated_contention_min") match {
          case JInt(n) => n.toInt
          case _ => Int.MaxValue // medians not yet recorded: signal off
        }))
    } catch { case scala.util.control.NonFatal(e) =>
      Unreadable(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
    }
  }

  /** Option view of [[loadResult]] for callers that only need
    * present-and-parseable (tests, replay).
    */
  def load(path: String = "BANDS.json"): Option[BandSet] = loadResult(path) match {
    case Loaded(b) => Some(b)
    case _ => None
  }

  /** Which profile a host-cal pair identifies: every RECORDED endpoint
    * must sit inside one profile's kernel band. None = no recorded
    * endpoint fits any profile (off-profile), or nothing recorded at
    * all (caller falls back to the hint for ledger replay).
    */
  def matchProfile(bands: BandSet, hostCal: Seq[Option[Double]]): Option[Profile] = {
    val recorded = hostCal.flatten
    if (recorded.isEmpty) None
    else bands.profiles.find(p => recorded.forall(v => v >= p.calLo && v <= p.calHi))
  }

  /** Partial kernel match (refined after r18 drive 2): one endpoint
    * inside a profile's band with the other(s) ABOVE its hi edge is
    * endpoint CONTENTION on that host — the single-threaded kernel
    * reading scalar slowness at one instant — not a new host profile.
    * A genuine profile shift (the r16 lesson) moves BOTH endpoints to
    * a new consistent range. Returns the profile whose band the
    * in-band endpoint(s) sit in, when every out-of-band endpoint sits
    * above (never below — a faster-than-every-profile kernel really
    * is unrecognized hardware).
    *
    * Cross-attribution guard (ADVICE r18): an above-band endpoint
    * that falls INSIDE a different profile's kernel band makes the
    * reading ambiguous — e.g. host_cal [0.90, 1.05] is either a
    * contended profile-A host or a profile-B host with one fast
    * endpoint, and picking A would compare the total against A's much
    * higher quiet cluster. Ambiguous readings return None
    * (off-profile: totals not comparable to any recorded cluster)
    * rather than guessing. r18 drives 2/3 are unaffected: their
    * elevated endpoints (1.503, 1.691) sit inside no profile's band.
    */
  def partialMatchAbove(bands: BandSet, hostCal: Seq[Option[Double]]): Option[Profile] = {
    val recorded = hostCal.flatten
    if (recorded.isEmpty) None
    else bands.profiles.find { p =>
      recorded.exists(v => v >= p.calLo && v <= p.calHi) &&
        recorded.forall(v => v >= p.calLo) &&
        recorded.exists(_ > p.calHi) &&
        recorded.filter(_ > p.calHi).forall(v =>
          !bands.profiles.exists(q => q.name != p.name && v >= q.calLo && v <= q.calHi))
    }
  }

  /** The read-order rules, executed. Returns (verdict, profileName).
    * Unrecorded fields contribute no evidence; the order mirrors
    * BANDS.json `_doc`: profile first (host_cal), then steady
    * contention (both par endpoints / rep_spread med / n_inflated),
    * then the single-endpoint-with-elevated-total contended start,
    * then the rep1 mid-drive transient, then tail-only contention
    * (tail_s above the profile's quiet tail band), then
    * unexplained-total (also mid-drive class), else quiet.
    */
  def classify(bands: BandSet, r: Reading): (String, String) = {
    val recordedCal = r.hostCal.flatten
    val fullMatch = matchProfile(bands, r.hostCal)
    val partialMatch = if (fullMatch.isEmpty) partialMatchAbove(bands, r.hostCal) else None
    val kernelElevated = partialMatch.isDefined
    val profile = fullMatch.orElse(partialMatch)
      .orElse(r.profileHint.flatMap(h => bands.profiles.find(_.name == h)))
    if (recordedCal.nonEmpty && fullMatch.isEmpty && partialMatch.isEmpty)
      return ("off-profile", profile.map(_.name).getOrElse("unknown"))
    val profName = profile.map(_.name).getOrElse("unknown")
    // effective per-endpoint par ratios: recorded ratio, else derived
    // kernel/host_cal at the same endpoint (the _doc's definition)
    val ratios = r.parRatio.zipWithIndex.map { case (pr, i) =>
      pr.orElse(for {
        pk <- r.parKernel.lift(i).flatten
        hc <- r.hostCal.lift(i).flatten
      } yield pk / hc)
    }.flatten
    val elevatedRatios = ratios.count(_ > bands.parRatioQuietHi)
    val totalElevated = profile.flatMap(_.eraClusters.get(r.catalog))
      .exists { case (_, hi) => r.total > hi }
    if (ratios.size >= 2 && elevatedRatios >= 2)
      return ("steady-contention", profName)
    if (r.repSpreadMed.exists(_ >= bands.repSpreadContentionMed))
      return ("steady-contention", profName)
    if (r.nInflated.exists(_ >= bands.nInflatedContentionMin))
      return ("steady-contention", profName)
    if ((elevatedRatios == 1 || kernelElevated) && totalElevated)
      return ("contended-start", profName)
    // a lone elevated endpoint (ratio or kernel) with a quiet total is
    // an endpoint transient (r16 drive 6, r17 drive 1 precedents) —
    // not a verdict
    if (r.rep1Med.exists(_ > bands.rep1MedQuietHi))
      return ("mid-drive-transient", profName)
    // tail-only contention (VERDICT r18 #2): the n_inflated blind spot
    // — headline medians quiet, the load sitting whole on the
    // single-shot tail. Named from its own field once the profile has
    // a recorded quiet tail band, instead of falling through to the
    // unexplained-total rule below.
    if (profile.flatMap(_.tailQuiet).exists { case (_, hi) => r.tailS.exists(_ > hi) })
      return ("tail-contention", profName)
    if (totalElevated)
      return ("mid-drive-transient", profName)
    ("quiet", profName)
  }
}
