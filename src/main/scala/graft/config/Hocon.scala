package graft.config

import scala.collection.mutable

/** Minimal HOCON-subset parser (reference contract:
  * `/root/reference/src/main/scala/com/lakehouse/ingestion/config/
  * ConfigLoader.scala:35` loads `.conf` via Typesafe Config). Offline build
  * has no typesafe-config jar, so this implements the subset the
  * reference's shipped configs actually use, plus substitutions:
  *
  *   - `#` / `//` comments; optional root braces
  *   - `key = value`, `key: value`, `key { ... }`; quoted keys
  *   - dotted keys expand to nested objects (`bootstrap.servers = ...`)
  *   - objects `{}` (duplicate keys deep-merge, scalars last-wins),
  *     arrays `[]` with comma or newline separators
  *   - quoted + unquoted strings, ints, doubles, booleans, null
  *   - `${path}` substitution resolved against the config root, falling
  *     back to environment variables; `${?path}` is optional (resolves to
  *     empty/removed when undefined); string concatenation around
  *     substitutions ("prefix"${x}"suffix")
  *   - `include "file.conf"` (via [[parseFile]]): splices the included
  *     file's object at the directive's position (deep-merge, later keys
  *     win) — relative paths resolve against the INCLUDING file's
  *     directory, include cycles and missing files fail with a pointed
  *     error. Substitutions resolve against the fully merged root, same
  *     as Typesafe Config's top-level resolve.
  *
  * Out of scope (not used by the reference configs): multiline strings,
  * value concatenation of objects/arrays, `+=`.
  *
  * Parse result: `LinkedHashMap[String, Any]` trees with `String`,
  * `Long`, `Double`, `Boolean`, `null`, `List[Any]` leaves.
  */
object Hocon {

  final case class HoconParseException(msg: String) extends RuntimeException(msg)

  private sealed trait Tok
  private final case class Str(s: String, quoted: Boolean = false) extends Tok
  private final case class Subst(path: String, optional: Boolean) extends Tok
  /** Unresolved value: token list to concatenate after substitution. */
  private final case class Pending(toks: List[Tok])

  type Obj = mutable.LinkedHashMap[String, Any]

  def parse(text: String, env: Map[String, String] = sys.env): Obj =
    parseText(text, env, baseDir = None, stack = Set.empty)

  /** Parse a `.conf` FILE — the entry point that enables `include`
    * directives (relative includes need to know the including file's
    * directory; bare-text parses have none and reject includes). */
  def parseFile(path: String, env: Map[String, String] = sys.env): Obj = {
    val p = java.nio.file.Paths.get(path).normalize.toAbsolutePath
    parseText(java.nio.file.Files.readString(p), env,
      baseDir = Option(p.getParent), stack = Set(p))
  }

  private def parseText(text: String, env: Map[String, String],
                        baseDir: Option[java.nio.file.Path],
                        stack: Set[java.nio.file.Path]): Obj = {
    val p = new Parser(text, baseDir, stack)
    val root = p.parseRoot()
    resolveObj(root, root, env, resolving = Set.empty)
    root
  }

  /** Convenience: string rendering of a leaf (options maps etc.). */
  def render(v: Any): String = v match {
    case null => "null"
    case s: String => s
    case other => other.toString
  }

  // ---- substitution resolution ------------------------------------------

  /** Locate the OWNING object + key for a dotted path, so resolution can
    * write the resolved value back (memoize) instead of only returning it. */
  private def lookupSlot(root: Obj, path: String): Option[(Obj, String)] = {
    val parts = path.split('.')
    var cur: Any = root
    var owner: Obj = root
    var key: String = null
    for (part <- parts) cur match {
      case o: Obj if o.contains(part) => owner = o; key = part; cur = o(part)
      case _ => return None
    }
    if (key == null) None else Some((owner, key))
  }

  private def resolveObj(o: Obj, root: Obj, env: Map[String, String], resolving: Set[String]): Unit =
    o.keys.toSeq.foreach { k =>
      o(k) match {
        case child: Obj   => resolveObj(child, root, env, resolving)
        case l: List[_]   => o(k) = l.map(resolveAny(_, root, env, resolving))
        case p: Pending   => o(k) = resolvePending(p, root, env, resolving)
        case _            => ()
      }
    }

  private def resolveAny(v: Any, root: Obj, env: Map[String, String], resolving: Set[String]): Any =
    v match {
      case child: Obj => resolveObj(child, root, env, resolving); child
      case l: List[_] => l.map(resolveAny(_, root, env, resolving))
      case p: Pending => resolvePending(p, root, env, resolving)
      case other      => other
    }

  private def resolvePending(p: Pending, root: Obj, env: Map[String, String], resolving: Set[String]): Any = {
    // genuine-cycle detection: fail only when a substitution path re-enters
    // its own resolution (a legitimate chain of any depth resolves fine)
    val vals: List[Option[Any]] = p.toks.map {
      case Str(s, _) => Some(s)
      case Subst(path, opt) =>
        if (resolving.contains(path))
          throw HoconParseException(
            s"substitution cycle through $${$path}")
        // MEMOIZE: write the resolved value back into its owning object,
        // so each key resolves at most once — without this, a doubling
        // chain (a1=${a0}${a0}, a2=${a1}${a1}, ...) re-resolves 2^n times
        lookupSlot(root, path).map { case (owner, key) =>
          val resolved = resolveAny(owner(key), root, env, resolving + path)
          owner(key) = resolved
          resolved
        }
          .orElse(env.get(path))
          .orElse(if (opt) None
                  else throw HoconParseException(s"unresolved substitution $${$path}"))
    }
    vals.flatten match {
      case Nil           => null
      case single :: Nil if p.toks.length == 1 => single
      case many          => many.map(render).mkString
    }
  }

  // ---- parser ------------------------------------------------------------

  private final class Parser(text: String,
                             baseDir: Option[java.nio.file.Path],
                             includeStack: Set[java.nio.file.Path]) {
    private var pos = 0
    private def eof = pos >= text.length
    private def ch = text.charAt(pos)

    private def err(msg: String): Nothing = {
      val line = text.substring(0, math.min(pos, text.length)).count(_ == '\n') + 1
      throw HoconParseException(s"$msg at line $line")
    }

    /** Skip spaces/tabs/CR (not newlines) and comments-to-EOL. */
    private def skipInline(): Unit = {
      while (!eof && (ch == ' ' || ch == '\t' || ch == '\r')) pos += 1
      if (!eof && (ch == '#' || (ch == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '/')))
        while (!eof && ch != '\n') pos += 1
    }

    /** Skip all whitespace incl. newlines and comments. */
    private def skipAll(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (!eof && ch.isWhitespace) { pos += 1; moved = true }
        if (!eof && (ch == '#' || (ch == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '/'))) {
          while (!eof && ch != '\n') pos += 1
          moved = true
        }
      }
    }

    def parseRoot(): Obj = {
      skipAll()
      val root =
        if (!eof && ch == '{') parseObject()
        else parseObjectBody(new mutable.LinkedHashMap[String, Any], atRoot = true)
      skipAll()
      if (!eof) err(s"trailing content '${ch}'")
      root
    }

    private def parseObject(): Obj = {
      pos += 1 // '{'
      val o = parseObjectBody(new mutable.LinkedHashMap[String, Any], atRoot = false)
      if (eof || ch != '}') err("expected '}'")
      pos += 1
      o
    }

    private def parseObjectBody(o: Obj, atRoot: Boolean): Obj = {
      var done = false
      while (!done) {
        skipAll()
        if (eof) { if (!atRoot) err("unterminated object"); done = true }
        else if (ch == '}') { if (atRoot) err("unexpected '}'"); done = true }
        else if (ch == ',') pos += 1
        else {
          val key = parseKey()
          skipInline()
          if (key == List("include") && !eof && ch == '"') {
            // `include "file.conf"`: splice the included file's root here
            // (deep-merge — keys after the directive override included ones)
            deepMerge(o, loadInclude(parseQuoted()))
          } else {
            val value: Any =
              if (!eof && ch == '{') parseObject()
              else if (!eof && (ch == '=' || ch == ':')) { pos += 1; skipInline(); parseValue() }
              else err(s"expected '=', ':' or '{' after key '${key.mkString(".")}'")
            putPath(o, key, value)
          }
        }
      }
      o
    }

    /** Key: quoted, or unquoted run; dotted unquoted keys become paths. */
    private def parseKey(): List[String] =
      if (ch == '"') List(parseQuoted())
      else {
        val sb = new StringBuilder
        while (!eof && !ch.isWhitespace && ch != '=' && ch != ':' && ch != '{' && ch != ',')
          { sb += ch; pos += 1 }
        if (sb.isEmpty) err("empty key")
        sb.toString.split('.').toList
      }

    private def putPath(o: Obj, path: List[String], value: Any): Unit = path match {
      case last :: Nil =>
        (o.get(last), value) match {
          case (Some(prev: Obj), nv: Obj) => deepMerge(prev, nv) // HOCON object merge
          case _                          => o(last) = value
        }
      case head :: rest =>
        val child = o.get(head) match {
          case Some(c: Obj) => c
          case _ => val c = new mutable.LinkedHashMap[String, Any]; o(head) = c; c
        }
        putPath(child, rest, value)
      case Nil => err("empty key path")
    }

    /** Read + parse an included file: relative paths resolve against the
      * INCLUDING file's directory; missing files and cycles fail loudly
      * (Typesafe silently ignores missing optional includes — a split
      * env-override conf that silently half-loads is worse than an error). */
    private def loadInclude(name: String): Obj = {
      val p0 = java.nio.file.Paths.get(name)
      val resolved = if (p0.isAbsolute) p0 else baseDir match {
        case Some(b) => b.resolve(name)
        case None => err(s"""include "$name": no base directory — load the config through parseFile/loadFromFile to use includes""")
      }
      val canon = resolved.normalize.toAbsolutePath
      if (includeStack.contains(canon))
        err(s"""include cycle through $canon""")
      if (!java.nio.file.Files.isRegularFile(canon))
        err(s"""include "$name": file not found at $canon""")
      new Parser(java.nio.file.Files.readString(canon),
        Option(canon.getParent), includeStack + canon).parseRoot()
    }

    private def deepMerge(into: Obj, from: Obj): Unit =
      from.foreach { case (k, v) =>
        (into.get(k), v) match {
          case (Some(a: Obj), b: Obj) => deepMerge(a, b)
          case _                      => into(k) = v
        }
      }

    private def parseQuoted(): String = {
      pos += 1 // '"'
      val sb = new StringBuilder
      while (!eof && ch != '"') {
        if (ch == '\\' && pos + 1 < text.length) {
          pos += 1
          sb += (ch match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'b' => '\b'; case 'f' => '\f'
            case 'u' =>
              val hex = text.substring(pos + 1, pos + 5); pos += 4
              Integer.parseInt(hex, 16).toChar
            case other => other
          })
          pos += 1
        } else { sb += ch; pos += 1 }
      }
      if (eof) err("unterminated string")
      pos += 1
      sb.toString
    }

    private def parseValue(): Any = {
      if (eof) err("expected value")
      ch match {
        case '{' => parseObject()
        case '[' => parseArray()
        case _   => parseLeaf()
      }
    }

    private def parseArray(): List[Any] = {
      pos += 1 // '['
      val items = mutable.ListBuffer[Any]()
      var done = false
      while (!done) {
        skipAll()
        if (eof) err("unterminated array")
        else if (ch == ']') { pos += 1; done = true }
        else if (ch == ',') pos += 1
        else items += parseValue()
      }
      items.toList
    }

    /** Scalar / substitution / concatenation, ending at EOL, ',', '}', ']'
      * or a comment. */
    private def parseLeaf(): Any = {
      val toks = mutable.ListBuffer[Tok]()
      var done = false
      while (!done) {
        if (eof || ch == '\n' || ch == ',' || ch == '}' || ch == ']' ||
            ch == '#' || (ch == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '/'))
          done = true
        else if (ch == '"') toks += Str(parseQuoted(), quoted = true)
        else if (ch == '$' && pos + 1 < text.length && text.charAt(pos + 1) == '{') {
          pos += 2
          val optional = !eof && ch == '?'
          if (optional) pos += 1
          val sb = new StringBuilder
          while (!eof && ch != '}') { sb += ch; pos += 1 }
          if (eof) err("unterminated substitution")
          pos += 1
          toks += Subst(sb.toString.trim, optional)
        } else {
          val sb = new StringBuilder
          while (!eof && ch != '\n' && ch != ',' && ch != '}' && ch != ']' &&
                 ch != '"' && ch != '#' &&
                 !(ch == '$' && pos + 1 < text.length && text.charAt(pos + 1) == '{') &&
                 !(ch == '/' && pos + 1 < text.length && text.charAt(pos + 1) == '/'))
            { sb += ch; pos += 1 }
          if (sb.nonEmpty) toks += Str(sb.toString)
        }
      }
      typed(toks.toList)
    }

    /** Single unquoted token parses as number/bool/null; anything else is
      * string concat (quoted pieces keep spaces, ends trimmed overall). */
    private def typed(toks: List[Tok]): Any = toks match {
      case Nil => err("expected value")
      case Str(raw, true) :: Nil => raw
      case Str(raw, _) :: Nil =>
        val s = raw.trim
        s match {
          case "true"  => true
          case "false" => false
          case "null"  => null
          case _ =>
            try java.lang.Long.parseLong(s): java.lang.Long
            catch { case _: NumberFormatException =>
              try java.lang.Double.parseDouble(s): java.lang.Double
              catch { case _: NumberFormatException => s }
            }
        }
      case many if many.exists(_.isInstanceOf[Subst]) =>
        Pending(trimEnds(many))
      case many =>
        trimEnds(many).collect { case Str(s, _) => s }.mkString
    }

    private def trimEnds(toks: List[Tok]): List[Tok] = {
      val a = toks match {
        case Str(s, false) :: rest => Str(s.replaceAll("^\\s+", "")) :: rest
        case other => other
      }
      a.reverse match {
        case Str(s, false) :: rest => (Str(s.replaceAll("\\s+$", ""), false) :: rest).reverse
        case other => a
      }
    }
  }
}
