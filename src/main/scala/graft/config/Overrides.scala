package graft.config

import scala.collection.immutable.ListMap
import graft.dsl.Cfg
import graft.dsl.Cfg._

/** Hydra-style dotted-path config overrides, the analog of the reference's
  * per-invocation `key=value` args (every reference entry point accepts them;
  * the runner forwards them to each stage command —
  * /root/reference/src/MEDS_transforms/runner.py:252-288). An override
  * `stages.occlude_outliers.stddev_cutoff=3` edits the parsed pipeline tree
  * in place of editing the file; values parse with the same scalar rules as
  * the YAML loader (ints, floats, YAML 1.1 bools, null, quoted strings, flow
  * `[...]`/`{...}` collections).
  *
  * Path semantics: map segments descend by key (creating missing intermediate
  * maps, Hydra's `++` behavior); LIST segments match either an integer index
  * or a stage entry's name — `stages.<stageName>.<key>` reaches into the
  * stage list the way `stage_cfg.<key>` does for the running stage in the
  * reference.
  */
object Overrides {

  /** Apply `key.path=value` overrides to a parsed config tree, in order.
    *
    * An override whose path does not already exist is APPLIED but noted:
    * stage keys legitimately absent from the file (builder defaults) must
    * stay settable — the reference's stage configs carry Hydra defaults the
    * pipeline file never spells out — but a silently-accepted typo
    * (`sttdev_cutoff=3`) would run the pipeline with the default while the
    * user believes the override took. Created paths surface as ONE
    * aggregated note (not a warning per override): builder-default keys are
    * routine, and a per-key warning stream trains users to ignore the one
    * that is a real typo.
    */
  def apply(cfg: Cfg, overrides: Seq[String]): Cfg = {
    val created = createdPaths(cfg, overrides)
    if (created.nonEmpty)
      System.err.println("[graft] note: override(s) set key(s) not present in " +
        s"the config file (builder defaults, or typos — check spelling if a " +
        s"replacement was intended): ${created.mkString(", ")}")
    overrides.foldLeft(cfg) { (c, o) =>
      val (path, value) = parseArg(o)
      set(c, path, value, o)
    }
  }

  /** The override paths that do not yet exist while applying `overrides` in
    * order (an earlier override can create the path a later one extends).
    */
  private[graft] def createdPaths(cfg: Cfg, overrides: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    overrides.foldLeft(cfg) { (c, o) =>
      val (path, value) = parseArg(o)
      if (!exists(c, path)) out += path.mkString(".")
      set(c, path, value, o)
    }
    out.result()
  }

  private[graft] def exists(node: Cfg, path: Seq[String]): Boolean = path match {
    case Seq() => true
    case seg +: rest => node match {
      case M(m) => m.get(seg).exists(exists(_, rest))
      case L(xs) =>
        val el = seg.toIntOption match {
          case Some(i) => xs.lift(i)
          case None => xs.find {
            case S(n) => n == seg
            case M(m) => m.size == 1 && m.head._1 == seg
            case _ => false
          }
        }
        el.exists {
          // a bare or single-key stage entry: descend into its config map
          case S(_) => rest.isEmpty
          case M(m) if seg.toIntOption.isEmpty && m.size == 1 => exists(m.head._2, rest)
          case other => exists(other, rest)
        }
      case _ => false
    }
  }

  /** Split one `a.b.c=value` argument into its path and parsed value. */
  def parseArg(arg: String): (Seq[String], Cfg) = {
    val eq = arg.indexOf('=')
    require(eq > 0, s"override must be <dotted.path>=<value>: '$arg'")
    val path = arg.substring(0, eq).split('.').toIndexedSeq
    require(path.forall(_.nonEmpty), s"override has an empty path segment: '$arg'")
    (path, Yaml.parseScalar(arg.substring(eq + 1)))
  }

  private def set(node: Cfg, path: Seq[String], value: Cfg, arg: String): Cfg =
    path match {
      case Seq() => value
      case seg +: rest => node match {
        case M(m) =>
          M(m.updated(seg, set(m.getOrElse(seg, Null), rest, value, arg)))
        case Null => // create missing intermediate maps
          M(ListMap(seg -> set(Null, rest, value, arg)))
        case L(xs) =>
          val idx = seg.toIntOption match {
            case Some(i) if i >= 0 && i < xs.length => i
            case Some(i) => throw new IllegalArgumentException(
              s"override '$arg': index $i out of range (list has ${xs.length} entries)")
            case None =>
              // a stage-entry list: match the entry named `seg`
              val i = xs.indexWhere {
                case S(n) => n == seg
                case M(m) => m.size == 1 && m.head._1 == seg
                case _ => false
              }
              if (i < 0) throw new IllegalArgumentException(
                s"override '$arg': no list entry named '$seg' " +
                  s"(entries: ${xs.map(entryName).mkString(", ")})")
              i
          }
          val updated = xs(idx) match {
            // a bare stage name gains a config map when a key is set under it
            case S(n) if seg.toIntOption.isEmpty =>
              M(ListMap(n -> set(Null, rest, value, arg)))
            case M(m) if seg.toIntOption.isEmpty && m.size == 1 =>
              M(ListMap(m.head._1 -> set(m.head._2, rest, value, arg)))
            case el => set(el, rest, value, arg)
          }
          L(xs.updated(idx, updated))
        case other => throw new IllegalArgumentException(
          s"override '$arg': cannot descend into scalar $other at '$seg'")
      }
    }

  private def entryName(c: Cfg): String = c match {
    case S(n) => n
    case M(m) if m.size == 1 => m.head._1
    case other => other.toString.take(30)
  }
}
