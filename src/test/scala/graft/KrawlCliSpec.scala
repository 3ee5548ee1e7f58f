package graft

import java.nio.file.Files
import graft.fixtures.SyntheticStore

/** The cleo/clikit CLI shell: grammar parity (cli/__init__.py:62-86,
  * fetch/url.py:30-54, fetch/fetcher.py:30-57) and dispatch through the
  * Krawl library facade, including exit-code parity (url.py:110-112).
  */
class KrawlCliSpec extends SparkTestBase {
  import KrawlCli._

  // ---- pure grammar ----

  test("fetch url: positional urls, multi -r/--repository, --report, " +
      "--opt=value and --opt value forms") {
    val p = parse(Seq("fetch", "url", "https://a/1", "https://a/2",
      "-r", "file", "--repository=s3", "--report", "/tmp/r.txt",
      "--store", "/s", "--table-root=/t")).toOption.get
    assert(p.command == FetchUrl(Seq("https://a/1", "https://a/2"),
      Seq("file", "s3"), Some("/tmp/r.txt"), Some("/s"), Some("/t")))
  }

  test("repository defaults to [file] like the reference (url.py:38-44)") {
    val p = parse(Seq("fetch", "url", "https://a/1")).toOption.get
    assert(p.command.asInstanceOf[FetchUrl].repositories == Seq("file"))
  }

  test("fetch <hosting-id>: registry-gated dynamic commands + --start-over") {
    val p = parse(Seq("fetch", "thingiverse.com", "--start-over")).toOption.get
    assert(p.command ==
      FetchAll("thingiverse.com", startOver = true, Seq("file"), None, None, None))
    assert(parse(Seq("fetch", "myspace.com")) ==
      Left("""The command "fetch myspace.com" is not defined."""))
  }

  test("global options: -c/--config anywhere, -v/-vv/-vvv verbosity, " +
      "--no-ansi, --version, -h/--help") {
    val p = parse(Seq("-c", "/cfg.yml", "fetch", "url", "u1", "-vv",
      "--no-ansi")).toOption.get
    assert(p.configPath.contains("/cfg.yml") && p.verbosity == 2 && p.noAnsi)
    assert(parse(Seq("--version")).toOption.get.command == ShowVersion)
    assert(parse(Seq("fetch", "-h")).toOption.get.command == Help(Seq("fetch")))
    assert(parse(Seq("help", "list")).toOption.get.command == Help(Seq("list")))
    assert(parse(Nil).toOption.get.command == Help(Nil))
  }

  test("errors: unknown option/command, missing option value, missing url") {
    assert(parse(Seq("fetch", "url", "u", "--bogus")) ==
      Left("""The "--bogus" option does not exist."""))
    assert(parse(Seq("fetch", "url", "u", "-x", "v")) ==
      Left("""The "-x" option does not exist."""))
    assert(parse(Seq("nonsense")) ==
      Left("""The command "nonsense" is not defined."""))
    assert(parse(Seq("list", "nonsense")) ==
      Left("""The command "list nonsense" is not defined."""))
    assert(parse(Seq("fetch", "url")) ==
      Left("""Not enough arguments (missing: "url")."""))
    assert(parse(Seq("fetch", "url", "u", "--report")) ==
      Left("""The "--report" option requires a value."""))
    // a flag given a value is a DIFFERENT error than a nonexistent option
    assert(parse(Seq("fetch", "thingiverse.com", "--start-over=true")) ==
      Left("""The "--start-over" option does not accept a value."""))
  }

  test("dispatch rejects unknown repository types like the reference " +
      "(factory.py:29 asserts; only 'file' is implemented)") {
    val p = parse(Seq("fetch", "url", "https://a/1", "-r", "s3",
      "--store", "/s", "--table-root", "/t")).toOption.get
    val r = KrawlCli.dispatch(null, p)
    assert(r.exitCode == 1)
    assert(r.lines.exists(_.contains("""Unknown repository type "s3"""")))
  }

  // ---- dispatch ----

  test("dispatch list fetchers / version / help need no Spark") {
    assert(dispatch(null, parse(Seq("list", "fetchers")).toOption.get) ==
      CliResult(0, Krawl.listFetchers))
    assert(dispatch(null, parse(Seq("--version")).toOption.get).exitCode == 0)
    assert(dispatch(null, parse(Seq("help", "fetch")).toOption.get)
      .lines.exists(_.contains("hosting ids")))
  }

  test("dispatch fetch url: report file written, exit code = failure count " +
      "(url.py:110-112), missing --store rejected") {
    val storeDir = Files.createTempDirectory("graft-cli-store").toString
    SyntheticStore.ensureOnDisk(spark, storeDir, 60)
    val root = Files.createTempDirectory("graft-cli-tables").toString
    val reportPath = Files.createTempDirectory("graft-cli-rep").toString + "/rep.txt"
    val p = parse(Seq("fetch", "url",
      "https://www.thingiverse.com/thing:7", "garbage",
      "--store", storeDir, "--table-root", root,
      "--report", reportPath)).toOption.get
    val r = dispatch(spark, p)
    assert(r.exitCode == 1, r.lines.mkString("; ")) // one failing url
    assert(r.lines.exists(l => l.startsWith("https://www.thingiverse.com/thing:7") &&
      l.endsWith("ok")))
    val rep = new String(Files.readAllBytes(java.nio.file.Paths.get(reportPath)))
    assert(rep.contains("garbage\tparse_error"))

    val missing = dispatch(spark,
      parse(Seq("fetch", "url", "u1", "--table-root", root)).toOption.get)
    assert(missing.exitCode == 1 &&
      missing.lines == Seq("""The "--store" option is required."""))
  }

  test("dispatch fetch <hosting-id>: configured full run; --start-over " +
      "re-fetches everything; bad --config rejected with every violation") {
    val storeDir = Files.createTempDirectory("graft-cli-store2").toString
    SyntheticStore.ensureOnDisk(spark, storeDir, 80)
    val root = Files.createTempDirectory("graft-cli-tables2").toString
    val args = Seq("fetch", "thingiverse.com", "--store", storeDir,
      "--table-root", root)
    val first = dispatch(spark, parse(args).toOption.get)
    assert(first.exitCode == 0)
    val attempted1 = first.lines.collectFirst {
      case l if l.startsWith("attempted: ") => l.drop("attempted: ".length).toLong
    }.get
    assert(attempted1 > 0)
    // resume: nothing left to fetch
    val second = dispatch(spark, parse(args).toOption.get)
    assert(second.lines.contains("attempted: 0"))
    // start-over: the full frontier again
    val third = dispatch(spark, parse(args :+ "--start-over").toOption.get)
    val attempted3 = third.lines.collectFirst {
      case l if l.startsWith("attempted: ") => l.drop("attempted: ".length).toLong
    }.get
    assert(attempted3 == attempted1, s"start-over refetched $attempted3 != $attempted1")

    val cfgPath = Files.createTempDirectory("graft-cli-cfg").toString + "/c.yml"
    Files.write(java.nio.file.Paths.get(cfgPath),
      "max_error_retries: 0\n".getBytes("UTF-8"))
    val bad = dispatch(spark,
      parse(args ++ Seq("--config", cfgPath)).toOption.get)
    assert(bad.exitCode == 1 &&
      bad.lines.exists(_.contains("maxErrorRetries must be in [1, 100]")),
      bad.lines.mkString("; "))
  }

  test("a '-'-prefixed token is never consumed as an option value " +
      "(--report --store /s reports the missing value)") {
    assert(parse(Seq("fetch", "url", "u1", "--report", "--store", "/s")) ==
      Left("""The "--report" option requires a value."""))
    // explicit '=' form still allows any value
    val p = parse(Seq("fetch", "url", "u1", "--report=-weird",
      "--store", "/s", "--table-root", "/t")).toOption.get
    assert(p.command.asInstanceOf[FetchUrl].report.contains("-weird"))
  }

  test("fetch <hosting-id> fetches ONLY that hosting and --start-over " +
      "resets only that fetcher's saved state (fetcher.py:44-47, 84-86)") {
    import org.apache.spark.sql.functions.col
    val storeDir = Files.createTempDirectory("graft-cli-store3").toString
    SyntheticStore.ensureOnDisk(spark, storeDir, 70)
    val root = Files.createTempDirectory("graft-cli-tables3").toString
    val P = graft.pipeline.CrawlPipeline
    def attempted(r: KrawlCli.CliResult): Long = r.lines.collectFirst {
      case l if l.startsWith("attempted: ") => l.drop("attempted: ".length).toLong
    }.get

    val tv = dispatch(spark, parse(Seq("fetch", "thingiverse.com",
      "--store", storeDir, "--table-root", root)).toOption.get)
    assert(tv.exitCode == 0 && attempted(tv) > 0)
    // only thingiverse rows in the log — the hosting restriction itself
    val hosts1 = P.fetchLogStore(root).read(spark).get
      .select("hosting_id").distinct().collect().map(_.getString(0)).toSet
    assert(hosts1 == Set("thingiverse.com"), hosts1.toString)

    val gh = dispatch(spark, parse(Seq("fetch", "github.com",
      "--store", storeDir, "--table-root", root)).toOption.get)
    assert(gh.exitCode == 0 && attempted(gh) > 0)

    // start-over scoped to thingiverse: its units re-fetch in full …
    val tv2 = dispatch(spark, parse(Seq("fetch", "thingiverse.com",
      "--start-over", "--store", storeDir, "--table-root", root)).toOption.get)
    assert(attempted(tv2) == attempted(tv), s"${attempted(tv2)} != ${attempted(tv)}")
    // … while github's saved state SURVIVED the reset (resume = nothing new)
    val gh2 = dispatch(spark, parse(Seq("fetch", "github.com",
      "--store", storeDir, "--table-root", root)).toOption.get)
    assert(attempted(gh2) == 0, s"github state was clobbered: ${gh2.lines}")
    val ghLog = P.fetchLogStore(root).read(spark).get
      .filter(col("hosting_id") === "github.com").count()
    assert(ghLog > 0)
  }

  test("bad --config rejected with every violation listed") {
    val storeDir = Files.createTempDirectory("graft-cli-store4").toString
    SyntheticStore.ensureOnDisk(spark, storeDir, 20)
    val root = Files.createTempDirectory("graft-cli-tables4").toString
    val args = Seq("fetch", "thingiverse.com", "--store", storeDir,
      "--table-root", root)
    val cfgPath = Files.createTempDirectory("graft-cli-cfg4").toString + "/c.yml"
    Files.write(java.nio.file.Paths.get(cfgPath),
      "max_error_retries: 0\n".getBytes("UTF-8"))
    val bad = dispatch(spark,
      parse(args ++ Seq("--config", cfgPath)).toOption.get)
    assert(bad.exitCode == 1 &&
      bad.lines.exists(_.contains("maxErrorRetries must be in [1, 100]")),
      bad.lines.mkString("; "))
  }
}
