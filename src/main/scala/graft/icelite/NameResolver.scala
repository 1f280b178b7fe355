package graft.icelite

/** Table-naming rules of the reference loader (semantics of
  * `/root/reference/utils.py:49-122`, re-implemented as pure Scala):
  * slugify a filename into a table identifier, optionally pluralize.
  */
object NameResolver {

  /** Lowercase; spaces/hyphens/dots -> `_`; drop other non `[a-z0-9_]`;
    * collapse runs of `_`; trim leading/trailing `_`. */
  def slugify(raw: String): String = {
    val lowered = raw.toLowerCase
      .map {
        case c if c == ' ' || c == '-' || c == '.' => '_'
        case c                                     => c
      }
      .filter(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_')
    lowered
      .replaceAll("_+", "_")
      .stripPrefix("_")
      .stripSuffix("_")
  }

  /** English pluralization: s/x/z/ch/sh -> +es; consonant+y -> ies;
    * f -> ves, fe -> ves; else +s. */
  def pluralize(word: String): String = {
    if (word.isEmpty) word
    else if (word.endsWith("s") || word.endsWith("x") || word.endsWith("z") ||
      word.endsWith("ch") || word.endsWith("sh")) word + "es"
    else if (word.endsWith("y") && word.length > 1 && !isVowel(word.charAt(word.length - 2)))
      word.dropRight(1) + "ies"
    else if (word.endsWith("fe")) word.dropRight(2) + "ves"
    else if (word.endsWith("f")) word.dropRight(1) + "ves"
    else word + "s"
  }

  private def isVowel(c: Char): Boolean = "aeiou".indexOf(c.toLower) >= 0

  /** Filename -> table name: strip extension, slugify, optionally pluralize
    * (the reference's `ICE_PLURALIZE_TABLE` defaults to false). */
  def tableNameFor(fileName: String, pluralizeNames: Boolean = false): String = {
    val base = fileName.split('/').last
    val noExt = base.lastIndexOf('.') match {
      case i if i > 0 => base.substring(0, i)
      case _          => base
    }
    val slug = slugify(noExt)
    if (pluralizeNames) pluralize(slug) else slug
  }
}
