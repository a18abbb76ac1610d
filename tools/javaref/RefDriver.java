import java.io.File;
import java.io.PrintStream;
import java.util.Map;
import java.util.TreeMap;

import edu.pitt.dbmi.nlp.noble.coder.NobleCoder;
import edu.pitt.dbmi.nlp.noble.coder.model.Document;
import edu.pitt.dbmi.nlp.noble.coder.model.Mention;
import edu.pitt.dbmi.nlp.noble.coder.model.Sentence;
import edu.pitt.dbmi.nlp.noble.ontology.owl.OOntology;
import edu.pitt.dbmi.nlp.noble.terminology.impl.NobleCoderTerminology;
import edu.pitt.dbmi.nlp.noble.tools.ConText;
import edu.pitt.dbmi.nlp.noble.util.ConceptImporter;

/**
 * Headless parity driver: build an in-memory terminology from an OBO
 * file, run NobleCoder over every .txt in a directory, emit mentions as
 * TSV (doc, start, end, code, matched text[, modifiers]) for diffing
 * against the Spark engine's annotate() output on identical inputs.
 *
 * Usage: java RefDriver terms.{obo|owl}|rrf_dir docs_dir out.tsv [search-method] [context.owl]
 */
public class RefDriver {
    public static void main(String[] args) throws Exception {
        NobleCoderTerminology.setPersistenceDirectory(
                new File("/tmp/noble_terms"));  // keep JDBM spill in /tmp
        boolean compact = args.length > 3 && "compact".equals(args[3]);
        ConceptImporter imp = ConceptImporter.getInstance();
        // compaction needs file-backed storage (temp word files)
        imp.setInMemory(!compact);
        imp.setCompact(compact);
        NobleCoderTerminology term = new NobleCoderTerminology();
        if (args[0].endsWith(".obo"))
            imp.loadOBO(term, new File(args[0]));
        else if (args[0].endsWith(".owl"))  // RDF/XML via the real OWL-API
            imp.loadOntology(term,
                    OOntology.loadOntology(new File(args[0])), "parityowl");
        else
            imp.loadRRF(term, new File(args[0]));  // dir of MRCONSO.RRF etc
        if (args.length > 3 && "hierarchy".equals(args[3])) {
            // dump the loaded terminology's structure instead of coding:
            // one EDGE row per Broader relation (as stored at import) and
            // one ROOT row per getRootConcepts() entry
            PrintStream hout = new PrintStream(new File(args[2]), "UTF-8");
            java.util.List<String> codes = new java.util.ArrayList<String>(
                    term.getStorage().getConceptMap().keySet());
            java.util.Collections.sort(codes);
            for (String code : codes) {
                edu.pitt.dbmi.nlp.noble.terminology.Concept c =
                        term.lookupConcept(code);
                if (c == null)
                    continue;
                java.util.Map rel = term.getRelatedConcepts(c);
                Object broader = rel.get(
                        edu.pitt.dbmi.nlp.noble.terminology.Relation.BROADER);
                if (broader != null) {
                    for (edu.pitt.dbmi.nlp.noble.terminology.Concept p :
                            (edu.pitt.dbmi.nlp.noble.terminology.Concept[])
                                    broader)
                        hout.println("EDGE\t" + code + "\t" + p.getCode());
                }
            }
            for (edu.pitt.dbmi.nlp.noble.terminology.Concept r :
                    term.getRootConcepts())
                hout.println("ROOT\t" + r.getCode());
            hout.close();
            System.out.println("done");
            return;
        }
        term.setSelectBestCandidate(true);  // batch pipeline default (NobleCoder.java:61)
        if (args.length > 3 && !"-".equals(args[3]) && !compact)
            term.setDefaultSearchMethod(args[3]);

        NobleCoder nc = new NobleCoder(term);
        boolean negex = args.length > 4 && "negex".equals(args[4]);
        boolean docproc = args.length > 4 && "docproc".equals(args[4]);
        // html mode: per-document HTMLExporter.export(doc, writer)
        // output, framed by ###DOC markers, optional ConText at args[5]
        boolean html = args.length > 4 && "html".equals(args[4]);
        // csv mode: CSVExporter.export(doc) rows (RESULTS.tsv) into
        // <out>.d/RESULTS.tsv, optional ConText at args[5]
        boolean csv = args.length > 4 && "csv".equals(args[4]);
        ConText ctx = null;
        if ((html || csv) && args.length > 5) {
            ctx = new ConText(OOntology.loadOntology(new File(args[5])));
            nc.setContextDetection(true);
            nc.setConText(ctx);
        } else if (args.length > 4 && !negex && !docproc && !html
                && !csv) {
            ctx = new ConText(OOntology.loadOntology(new File(args[4])));
            nc.setContextDetection(true);
            nc.setConText(ctx);
        } else {
            nc.setContextDetection(false);
        }
        edu.pitt.dbmi.nlp.noble.tools.NegEx ng =
                negex ? new edu.pitt.dbmi.nlp.noble.tools.NegEx() : null;
        PrintStream out = new PrintStream(new File(args[2]), "UTF-8");
        edu.pitt.dbmi.nlp.noble.util.CSVExporter cx = null;
        if (csv) {
            File dir = new File(args[2] + ".d");
            dir.mkdirs();
            new File(dir, "RESULTS.tsv").delete();
            cx = new edu.pitt.dbmi.nlp.noble.util.CSVExporter(dir);
        }
        File[] files = new File(args[1]).listFiles();
        java.util.Arrays.sort(files);
        for (File f : files) {
            if (!f.getName().endsWith(".txt"))
                continue;
            Document doc = nc.process(f);
            if (csv) {
                cx.export(doc);
                continue;
            }
            if (html) {
                // in-memory imports leave Concept.terminology null;
                // codeConcept needs it for the servlet URL
                for (Mention m : doc.getMentions())
                    if (m.getConcept().getTerminology() == null)
                        m.getConcept().setTerminology(term);
                edu.pitt.dbmi.nlp.noble.util.HTMLExporter ex =
                        new edu.pitt.dbmi.nlp.noble.util.HTMLExporter();
                java.io.StringWriter sw = new java.io.StringWriter();
                ex.export(doc, sw);
                out.println("###DOC\t" + f.getName());
                out.println(sw.toString());
                continue;
            }
            if (docproc) {
                for (Sentence s : doc.getSentences()) {
                    String sec = s.getSection() != null
                            ? s.getSection().getTitle() : "";
                    out.println(f.getName() + "\t" + s.getOffset() + "\t"
                            + s.getSentenceType() + "\t" + sec);
                }
                continue;
            }
            for (Sentence s : doc.getSentences()) {
                if (ng != null)
                    ng.process(s);
                for (Mention m : s.getMentions()) {
                    StringBuilder mods = new StringBuilder();
                    Map<String, String> mm = new TreeMap<String, String>();
                    for (String ty : m.getModifiers().keySet())
                        mm.put(ty, m.getModifierValue(ty));
                    for (Map.Entry<String, String> e : mm.entrySet())
                        mods.append(e.getKey()).append("=")
                            .append(e.getValue()).append(";");
                    out.println(f.getName() + "\t" + m.getStartPosition()
                            + "\t" + m.getEndPosition() + "\t"
                            + m.getConcept().getCode() + "\t"
                            + m.getText() + "\t" + mods + "\t"
                            + m.getConcept().getScore());
                }
            }
        }
        if (cx != null)
            cx.flush();
        out.close();
        System.out.println("done");
    }
}
