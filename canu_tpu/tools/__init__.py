"""Ancillary command-line tools (the reference's ~40 standalone binaries).

`python -m canu_tpu.tools <cmd> ...` exposes the utility surface that
the reference ships as separate C++ programs (SURVEY §2.2/§2.12):

  simulate    fastqSimulate (/root/reference/src/fastq-utilities/fastqSimulate.C)
  sample      fastqSample (fastqSample.C — subsample to coverage/fraction)
  analyze     fastqAnalyze (fastqAnalyze.C — read stats, GC, N50)
  dump-reads  gatekeeperDumpFASTQ (/root/reference/src/stores/gatekeeperDumpFASTQ.C)
  dump-meta   gatekeeperDumpMetaData -stats (gatekeeperDumpMetaData.C)
  ov-stats    ovStoreStats / ovStoreHistogram (/root/reference/src/stores/)
  ov-dump     overlapConvert / ovStoreDump (text dump)
  ov-import   overlapImport + mmapConvert (text/PAF -> store; -random N)
  kmer-count  meryl count + histogram + threshold (/root/reference/src/meryl/)
  tig-dump    tgStoreDump (fasta/layout/sizes dumps)
  tig-display tgTigDisplay (one tig, human-readable)
  bogus       bogus + bogusness (assembly-vs-truth evaluation, src/bogus/)

Each is a thin CLI over library APIs — the framework's functionality
lives in the library, not in these wrappers.
"""
