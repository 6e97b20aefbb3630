package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** docs/COOKBOOK.md is the user-facing API map; a doc that drifts from the
  * code is worse than none. Every backticked `graft.*` reference in the
  * cookbook must resolve against the compiled classes: either a type
  * (object / trait / class) or an `object.method` whose object exposes the
  * method. Renaming or removing an entry point without updating the
  * cookbook fails this suite. */
class CookbookSpec extends AnyFunSuite {

  private val refPattern = "`(graft\\.[A-Za-z0-9_.]+)`".r

  private def resolvesAsType(name: String): Boolean =
    try { Class.forName(name); true }
    catch {
      case _: ClassNotFoundException =>
        try { Class.forName(name + "$"); true }
        catch { case _: ClassNotFoundException => false }
    }

  private def resolvesAsObjectMethod(ref: String): Boolean = {
    val i = ref.lastIndexOf('.')
    if (i < 0) return false
    val (owner, method) = (ref.substring(0, i), ref.substring(i + 1))
    try Class.forName(owner + "$").getMethods.exists(_.getName == method)
    catch { case _: ClassNotFoundException => false }
  }

  test("every graft.* reference in docs/COOKBOOK.md resolves to real code") {
    val md = Files.readAllLines(Paths.get("docs/COOKBOOK.md")).asScala.mkString("\n")
    val refs = refPattern.findAllMatchIn(md).map(_.group(1)).toSeq.distinct
    assert(refs.size >= 30, s"cookbook has only ${refs.size} graft.* references")
    val broken = refs.filterNot(r => resolvesAsType(r) || resolvesAsObjectMethod(r))
    assert(broken.isEmpty, s"cookbook references that resolve to nothing: $broken")
  }

  test("the resolver actually rejects phantom references") {
    assert(!resolvesAsType("graft.operators.NoSuchThing"))
    assert(!resolvesAsObjectMethod("graft.operators.Dedup.noSuchMethod"))
    assert(resolvesAsObjectMethod("graft.operators.Dedup.duplicateClusters"))
    assert(resolvesAsType("graft.operators.CheckpointMode"))
  }
}
