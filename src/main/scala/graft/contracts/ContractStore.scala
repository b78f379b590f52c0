package graft.contracts

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Semantic version with the operations the reference uses
  * (parse / compare / bump — dc43 `core/versioning.py` semantics). */
final case class SemVer(major: Int, minor: Int, patch: Int, suffix: Option[String] = None)
    extends Ordered[SemVer] {
  def compare(that: SemVer): Int = {
    val c = Ordering[(Int, Int, Int)].compare((major, minor, patch), (that.major, that.minor, that.patch))
    if (c != 0) c
    else (suffix, that.suffix) match { // release > pre-release
      case (None, None)       => 0
      case (None, Some(_))    => 1
      case (Some(_), None)    => -1
      case (Some(a), Some(b)) => SemVer.comparePreRelease(a, b)
    }
  }
  def bump(level: String): SemVer = level match {
    case "major" => SemVer(major + 1, 0, 0)
    case "minor" => SemVer(major, minor + 1, 0)
    case _       => SemVer(major, minor, patch + 1)
  }
  override def toString: String =
    s"$major.$minor.$patch" + suffix.map("-" + _).getOrElse("")
}

object SemVer {
  private val Re = """^(\d+)\.(\d+)\.(\d+)(?:-(.+))?$""".r
  def parse(s: String): SemVer = s match {
    case Re(ma, mi, pa, suf) => SemVer(ma.toInt, mi.toInt, pa.toInt, Option(suf))
    case _ => throw new IllegalArgumentException(s"not a semver: $s")
  }
  def tryParse(s: String): Option[SemVer] = scala.util.Try(parse(s)).toOption

  /** semver.org §11.4 pre-release precedence, exactly: dot-separated
    * identifiers; all-digit identifiers compare numerically (`rc.10` >
    * `rc.2`) and rank below alphanumeric ones; alphanumeric identifiers
    * compare lexically (so `rc10` < `rc2` — use dotted numerics for
    * numbered candidates); a longer identifier list wins a tie. No
    * stem/tail heuristics: they made the ordering intransitive
    * (rc10 < rc1x < rc2 < rc10), which can blow up TimSort. Numeric
    * comparison is overflow-safe (leading-zero-stripped length+lex, not
    * toLong). */
  private[contracts] def comparePreRelease(a: String, b: String): Int = {
    def numCmp(x: String, y: String): Int = {
      val (nx, ny) = (x.dropWhile(_ == '0'), y.dropWhile(_ == '0'))
      val c = nx.length.compare(ny.length)
      if (c != 0) c else nx.compare(ny)
    }
    val (as, bs) = (a.split('.'), b.split('.'))
    as.zip(bs).foreach { case (x, y) =>
      val c = (x.forall(_.isDigit), y.forall(_.isDigit)) match {
        case (true, true)   => numCmp(x, y)
        case (true, false)  => -1
        case (false, true)  => 1
        case (false, false) => x.compare(y)
      }
      if (c != 0) return c
    }
    as.length.compare(bs.length)
  }
}

/** Versioned contract persistence. */
trait ContractStore {
  def put(contract: Contract): Unit
  def get(id: String, version: String): Option[Contract]
  def listVersions(id: String): Seq[String]
  def listContractIds(): Seq[String]
  /** Highest released (non-suffixed sorts above pre-release) version. */
  def latest(id: String): Option[Contract] =
    listVersions(id).flatMap(v => SemVer.tryParse(v).map(_ -> v)).sortBy(_._1).lastOption
      .flatMap { case (_, v) => get(id, v) }
}

/** Filesystem store: `<root>/<contract-id>/<version>.json`.
  * Mirrors the reference's filesystem contract store layout
  * (dc43 `service_backends/contracts/backend/stores`). */
final class FsContractStore(rootDir: String) extends ContractStore {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  private def safe(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  override def put(contract: Contract): Unit = {
    val dir = root.resolve(safe(contract.id))
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(safe(contract.version) + ".json"), ContractJson.toJson(contract))
  }

  override def get(id: String, version: String): Option[Contract] = {
    val f = root.resolve(safe(id)).resolve(safe(version) + ".json")
    if (Files.exists(f)) Some(ContractJson.fromJson(Files.readString(f))) else None
  }

  override def listVersions(id: String): Seq[String] = {
    val dir = root.resolve(safe(id))
    if (!Files.isDirectory(dir)) Nil
    else
      scala.util.Using.resource(Files.list(dir)) { s =>
        s.iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.endsWith(".json"))
          .map(_.stripSuffix(".json"))
          .toSeq.sorted
      }
  }

  override def listContractIds(): Seq[String] =
    if (!Files.isDirectory(root)) Nil
    else scala.util.Using.resource(Files.list(root)) { s =>
      s.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toSeq.sorted
    }
}
