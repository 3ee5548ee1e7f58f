package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's unit-test fixture contract verbatim
  * (/root/reference/tests/normalizer/github.py:14-51) and adds seeded
  * property-style tests over the canonicalizer (parse ∘ build = identity on
  * forge URLs).
  */
class HostingSpec extends AnyFunSuite {
  // Constants from /root/reference/tests/normalizer/github.py:14-22
  val BaseUrl = "https://github.com"
  val Slug = "iop-alliance/OpenKnowHow"
  val FileRelativePath = ".gitignore"
  val DevBranch = "master"
  val Version = "v1.1.0"
  val FileWebUrl = s"$BaseUrl/$Slug/blob/master/.gitignore"
  val FileDlUrl = s"$BaseUrl/$Slug/raw/master/.gitignore"
  val FileFrozenWebUrl = s"$BaseUrl/$Slug/blob/$Version/.gitignore"
  val FileFrozenDlUrl = s"$BaseUrl/$Slug/raw/$Version/.gitignore"

  val proj = GitHubFileHandler.ProjInfo(Slug, Some(Version), Some(DevBranch))

  test("is_frozen_url (ref tests/normalizer/github.py:27-31)") {
    assert(GitHubFileHandler.isFrozenUrl(proj, FileFrozenDlUrl))
    assert(!GitHubFileHandler.isFrozenUrl(proj, FileDlUrl))
  }

  test("to_url (ref tests/normalizer/github.py:33-37)") {
    assert(GitHubFileHandler.toUrl(proj, FileRelativePath, frozen = true) ==
      s"$BaseUrl/$Slug/raw/$Version/$FileRelativePath")
  }

  test("extract_path (ref tests/normalizer/github.py:39-43; actual ref behavior)") {
    // The reference's extract_path joins path_parts[pre_vers_path_parts:]
    // (normalizer/github.py:100-105), which INCLUDES the version segment —
    // its own test masks this by using assertTrue(a, b) instead of
    // assertEqual. We reproduce the actual reference behavior.
    assert(GitHubFileHandler.extractPath(FileFrozenDlUrl) == s"$Version/$FileRelativePath")
    assert(GitHubFileHandler.extractPath(FileDlUrl) == s"$DevBranch/$FileRelativePath")
  }

  test("extract_slug (ref tests/normalizer/github.py:45-47)") {
    assert(GitHubFileHandler.extractSlug(FileFrozenDlUrl).contains(Slug))
  }

  test("default dev branches gate frozen-ness without explicit dev_branch") {
    val noDev = GitHubFileHandler.ProjInfo(Slug, Some(Version), None)
    for (b <- GitHubFileHandler.DefaultDevBranches)
      assert(!GitHubFileHandler.isFrozenUrl(noDev, s"$BaseUrl/$Slug/raw/$b/x"))
    assert(GitHubFileHandler.isFrozenUrl(noDev, s"$BaseUrl/$Slug/raw/v2.0/x"))
  }

  test("github blob URL parses to forge unit (ref hosting_unit_forge.py:90-110)") {
    val u = UrlCanonicalizer.parse(FileWebUrl).toOption.get
    assert(u == ForgeUnit(HostingId.GithubCom, "iop-alliance", "OpenKnowHow",
      None, Some("master"), Some(".gitignore")))
    assert(u.toPathStr == "github.com/iop-alliance/OpenKnowHow/master/.gitignore")
  }

  test("raw.githubusercontent URL canonicalizes to the same unit as blob URL (ref hosting_id.py:122)") {
    val blob = UrlCanonicalizer.parse(FileWebUrl).toOption.get
    val raw = UrlCanonicalizer
      .parse(s"https://raw.githubusercontent.com/$Slug/master/.gitignore").toOption.get
    assert(blob.toPathStr == raw.toPathStr)
  }

  test("gitlab -/blob URL parses (ref hosting_unit_forge.py:112-125)") {
    val u = UrlCanonicalizer.parse("https://gitlab.com/own/proj/-/blob/main/dir/okh.yml").toOption.get
    assert(u == ForgeUnit(HostingId.GitlabCom, "own", "proj", None, Some("main"), Some("dir/okh.yml")))
  }

  test("releases/tag and commit refs parse (ref hosting_unit_forge.py:103-106)") {
    val tag = UrlCanonicalizer.parse(s"$BaseUrl/o/r/releases/tag/v1.0").toOption.get
    assert(tag == ForgeUnit(HostingId.GithubCom, "o", "r", None, Some("v1.0"), None))
    val commit = UrlCanonicalizer.parse(s"$BaseUrl/o/r/commit/abc123").toOption.get
    assert(commit == ForgeUnit(HostingId.GithubCom, "o", "r", None, Some("abc123"), None))
  }

  test("thingiverse thing URL + id/10000 path grouping (ref hosting_unit_web.py:28-33,76-86)") {
    val u = UrlCanonicalizer.parse("https://www.thingiverse.com/thing:3062487").toOption.get
    assert(u == WebUnit(HostingId.ThingiverseCom, "3062487"))
    assert(u.toPathStr == "thingiverse.com/306/3062487")
  }

  test("oshwa + appropedia URLs parse (ref hosting_unit_web.py:59-74)") {
    val o = UrlCanonicalizer.parse("https://certification.oshwa.org/br000010.html").toOption.get
    assert(o == WebUnit(HostingId.OshwaOrg, "br000010"))
    assert(o.toPathStr == "oshwa.org/br000010")
    val a = UrlCanonicalizer
      .parse("https://www.appropedia.org/Open_Source_Digitally_Replicable_Lab-Grade_Scales")
      .toOption.get
    assert(a == WebUnit(HostingId.AppropediaOrg, "Open_Source_Digitally_Replicable_Lab-Grade_Scales"))
  }

  test("invalid / unknown-platform URLs fail cleanly") {
    assert(UrlCanonicalizer.parse("not a url").isLeft)
    assert(UrlCanonicalizer.parse("https://example.com/x").isLeft)
    assert(UrlCanonicalizer.parse("https://www.thingiverse.com/blob:e5d9").isLeft)
    assert(UrlCanonicalizer.parse("ftp://github.com/a/b").isLeft)
  }

  test("non-numeric thing id is a parse failure, not a toPathStr crash") {
    // used to parse successfully and then throw NumberFormatException inside
    // the codegen'd CanonicalUnitPath expression at toPathStr
    assert(UrlCanonicalizer.parse("https://www.thingiverse.com/thing:abc").isLeft)
    assert(UrlCanonicalizer.canonicalPath("https://www.thingiverse.com/thing:abc").isEmpty)
    assert(UrlCanonicalizer.parse("https://www.thingiverse.com/thing:").isLeft)
    // a directly-constructed non-numeric WebUnit must still never throw
    assert(WebUnit(HostingId.ThingiverseCom, "abc").toPathStr == "thingiverse.com/abc")
  }

  test("download URL builders (ref hosting_unit_forge.py:185-225)") {
    val gh = ForgeUnit(HostingId.GithubCom, "o", "r", None, Some("main"), None)
    assert(gh.downloadUrl(Some("okh.toml")) ==
      "https://raw.githubusercontent.com/o/r/main/okh.toml")
    val cb = ForgeUnit(HostingId.CodebergOrg, "o", "r", None, None, None)
    assert(cb.downloadUrl(Some("f")) == "https://codeberg.org/o/r/raw/HEAD/f")
    val gl = ForgeUnit(HostingId.GitlabCom, "o", "r", None, Some("main"), None)
    assert(gl.downloadUrl(Some("f")) == "https://gitlab.com/o/r/-/raw/main/f")
  }

  private def ident(rnd: scala.util.Random): String = {
    val chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    (0 until (1 + rnd.nextInt(12))).map(_ => chars(rnd.nextInt(chars.length))).mkString
  }

  test("property: parse(downloadUrl) canonicalizes back to same owner/repo/ref (seed 42, 500 cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val owner = ident(rnd); val repo = ident(rnd); val ref = ident(rnd)
      val path =
        if (rnd.nextBoolean()) Some((0 to rnd.nextInt(3)).map(_ => ident(rnd)).mkString("/"))
        else None
      val unit = ForgeUnit(HostingId.GithubCom, owner, repo, None, Some(ref), path)
      val parsed = UrlCanonicalizer.parse(unit.downloadUrl(path)).toOption.get
      assert(parsed == unit, s"roundtrip failed for ${unit.downloadUrl(path)}")
    }
  }

  test("property: thingiverse build/parse roundtrip incl. path grouping (seed 42, 500 cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val id = 1L + rnd.nextLong(99999999L)
      val unit = WebUnit(HostingId.ThingiverseCom, id.toString)
      assert(UrlCanonicalizer.parse(unit.projectHostingUrl).toOption.get == unit)
      assert(unit.toPathStr == s"thingiverse.com/${id / 10000}/$id")
    }
  }

  test("manifest-name predicate (ref krawl/fetcher/util.py:26-32)") {
    assert(Predicates.isAcceptedManifestFileName("okh.toml"))
    assert(Predicates.isAcceptedManifestFileName("project.okh.yml"))
    assert(Predicates.isAcceptedManifestFileName("okh-ventilator.yaml"))
    assert(Predicates.isAcceptedManifestFileName("okh_v1.json"))
    assert(!Predicates.isAcceptedManifestFileName("okhno"))
    assert(!Predicates.isAcceptedManifestFileName("readme.toml"))
    assert(!Predicates.isAcceptedManifestFileName("okh.txt"))
    assert(!Predicates.isAcceptedManifestFileName("okh"))
  }

  test("blocklist prefixes (ref manifests_list_flat.py:180-191)") {
    assert(Predicates.isBlockedUrl("https://projects.openhardware.science/x/y"))
    assert(Predicates.isBlockedUrl("https://field-ready-projects.openknowhow.org/z"))
    assert(!Predicates.isBlockedUrl("https://github.com/a/b"))
  }
}
