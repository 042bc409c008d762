package graft.config

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.logging.{ConsoleHandler, FileHandler, Formatter, Handler, Level, LogRecord, Logger}

/** Timestamped file+console logging setup — the Scala port of the
  * reference's `LoggingConfig`
  * (`/root/reference/ons_utils/config/config.py:225-304`), built on
  * `java.util.logging` (standard library only; Spark's log4j2
  * configuration is deliberately left untouched so engine logging never
  * interferes with executor logging).
  *
  * Mirrored semantics: a unique run id from the current timestamp
  * (`create_log_id`, `config.py:235-237`), a logs directory resolved
  * once and creatable on demand (`config.py:239-249`), and a dual
  * console (INFO, terse) + file (DEBUG, verbose) handler setup
  * (`config.py:251-304`). Differences by design: the logs dir is a
  * constructor parameter (default `$HOME/graft_run_logs`) instead of a
  * hardcoded pipeline path, and the `basic`/`debug` formatters are
  * typed `Formatter`s rather than dictConfig strings.
  */
final class LoggingConfig(
    baseDir: Option[Path] = None,
    clock: () => LocalDateTime = () => LocalDateTime.now()) {

  /** Unique log id from the current timestamp (`config.py:235-237`). */
  val logId: String =
    "log_" + clock().format(DateTimeFormatter.ofPattern("yyMMdd_HHmmss"))

  /** Logs directory (`config.py:239-245`). */
  val logDir: Path =
    baseDir.getOrElse(Paths.get(sys.props("user.home"), "graft_run_logs"))

  val filename: String = s"$logId.log"
  val fullPath: Path = logDir.resolve(filename)

  private var attached: Seq[Handler] = Nil

  /** Create the log directory if missing (`config.py:248-249`). */
  def createLogsDir(): Unit = { Files.createDirectories(logDir); () }

  /** Install console (INFO, `console` formatter) + file (DEBUG,
    * `textLog` formatter) handlers on the root logger
    * (`set_logging_config`, `config.py:251-304`). When
    * `disableOtherLoggers` is set, pre-existing root handlers are
    * removed first. */
  def setLoggingConfig(
      console: Formatter = LoggingConfig.basic,
      textLog: Formatter = LoggingConfig.debug,
      disableOtherLoggers: Boolean = false): Logger = {
    createLogsDir()
    val root = Logger.getLogger("")
    if (disableOtherLoggers) root.getHandlers.foreach { h =>
      root.removeHandler(h); h.close()
    }
    val con = new ConsoleHandler()
    con.setLevel(Level.INFO)
    con.setFormatter(console)
    val file = new FileHandler(fullPath.toString)
    file.setLevel(Level.ALL) // reference file handler is DEBUG-level
    file.setFormatter(textLog)
    root.addHandler(con)
    root.addHandler(file)
    // Root stays at INFO, exactly like the reference's dictConfig root
    // logger (config.py:279-283). Deliberately NOT Level.ALL: a global
    // ALL also enables FINE logging inside libraries that key behavior
    // off it (janino's compiler flips into its debug path and can fail
    // whole-stage codegen). Loggers that want DEBUG in the file opt in
    // with their own setLevel — the file handler accepts all levels.
    root.setLevel(Level.INFO)
    attached = Seq(con, file)
    root
  }

  /** Detach and close the handlers installed by [[setLoggingConfig]]
    * (releases the file lock — JUL has no dictConfig-style teardown). */
  def close(): Unit = {
    val root = Logger.getLogger("")
    attached.foreach { h => root.removeHandler(h); h.close() }
    attached = Nil
  }
}

object LoggingConfig {

  /** `basic` formatter: the message alone (`config.py:293-295`). */
  val basic: Formatter = new Formatter {
    def format(r: LogRecord): String = formatMessage(r) + "\n"
  }

  /** `debug` formatter: timestamp, level, and source location
    * (`config.py:296-299`). */
  val debug: Formatter = new Formatter {
    private val ts = DateTimeFormatter.ofPattern("yy/MM/dd HH:mm:ss")
    def format(r: LogRecord): String = {
      val when = LocalDateTime.ofInstant(r.getInstant, java.time.ZoneId.systemDefault())
      val src = s"${r.getSourceClassName}.${r.getSourceMethodName}"
      s"[${when.format(ts)} ${r.getLevel} - src=$src] ${formatMessage(r)}\n"
    }
  }
}
